"""Structural XSD-subset validation with stdlib xml.etree.

Reference: dataprovider/XmlDataProvider.java:289-302 — the import aborts
when the document does not comply with the XSD given via `-schemaFilePath`.
The reference delegates to the JDK's full W3C validator; this validator
covers the STRUCTURAL subset that import files exercise:

* global/inline ``xs:element`` declarations, named/anonymous
  ``xs:complexType``
* ``xs:sequence`` (ordered), ``xs:all`` (unordered), ``xs:choice``
  content models, with ``minOccurs``/``maxOccurs`` on elements and on the
  model group itself
* unknown / out-of-order / under- and over-occurring elements are errors

Out of scope (documented): attribute validation, simple-type facets
(patterns, enumerations, ranges), identity constraints, namespaces beyond
stripping the ``xs:`` prefix, substitution groups, ``xs:any``. A document
that passes here can still fail the JDK validator on facets; everything
rejected here is genuinely invalid.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

_XS = "{http://www.w3.org/2001/XMLSchema}"
_UNBOUNDED = 1 << 30


class XsdValidationError(ValueError):
    """Document does not comply with the XSD (reference aborts the import:
    XmlDataProvider.java:302)."""


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _occurs(el) -> tuple[int, int]:
    lo = int(el.get("minOccurs", "1"))
    hi_s = el.get("maxOccurs", "1")
    hi = _UNBOUNDED if hi_s == "unbounded" else int(hi_s)
    return lo, hi


class _Schema:
    def __init__(self, root):
        self.named_types: dict[str, ET.Element] = {}
        self.global_elements: dict[str, ET.Element] = {}
        for child in root:
            tag = _local(child.tag)
            if tag == "complexType" and child.get("name"):
                self.named_types[child.get("name")] = child
            elif tag == "element" and child.get("name"):
                self.global_elements[child.get("name")] = child

    def complex_type_of(self, el_decl) -> ET.Element | None:
        """The complexType governing an element declaration, or None for
        simple/untyped content."""
        t = el_decl.get("type")
        if t:
            t_local = t.split(":", 1)[-1]
            return self.named_types.get(t_local)  # xs:string etc → None
        inline = el_decl.find(f"{_XS}complexType")
        return inline

    def decl_for_ref(self, el_decl) -> ET.Element:
        ref = el_decl.get("ref")
        if ref:
            name = ref.split(":", 1)[-1]
            if name not in self.global_elements:
                raise XsdValidationError(f"unresolved element ref {ref!r}")
            return self.global_elements[name]
        return el_decl


def _model_group(ctype) -> ET.Element | None:
    for child in ctype:
        if _local(child.tag) in ("sequence", "all", "choice"):
            return child
    return None


def _validate_element(schema: _Schema, instance, el_decl, path: str) -> None:
    ctype = schema.complex_type_of(el_decl)
    children = list(instance)
    if ctype is None:
        if children:
            raise XsdValidationError(
                f"{path}: element has child elements but is declared simple"
            )
        return
    group = _model_group(ctype)
    if group is None:
        if children:
            raise XsdValidationError(f"{path}: no content model allows children")
        return
    _validate_group(schema, children, group, path)


def _validate_group(schema: _Schema, children, group, path: str) -> None:
    kind = _local(group.tag)
    g_lo, g_hi = _occurs(group)
    items = [c for c in group if _local(c.tag) in ("element", "sequence", "all", "choice")]
    if kind == "sequence":
        idx = 0
        reps = 0
        while reps < g_hi:
            start = idx
            bail = False
            for item in items:
                if _local(item.tag) != "element":
                    raise XsdValidationError(
                        f"{path}: nested model groups inside sequence are out of scope"
                    )
                decl = schema.decl_for_ref(item)
                name = decl.get("name")
                lo, hi = _occurs(item)
                count = 0
                while (
                    idx < len(children)
                    and _local(children[idx].tag) == name
                    and count < hi
                ):
                    _validate_element(
                        schema, children[idx], decl, f"{path}/{name}[{count}]"
                    )
                    idx += 1
                    count += 1
                if count < lo:
                    if reps >= g_lo and idx == start:
                        bail = True  # optional extra repetition: not started
                        break
                    raise XsdValidationError(
                        f"{path}/{name}: occurs {count} < minOccurs {lo}"
                        + (
                            f" (next element is <{_local(children[idx].tag)}>)"
                            if idx < len(children)
                            else ""
                        )
                    )
            reps += 1
            if bail or idx >= len(children) or idx == start:
                break
        if idx < len(children):
            raise XsdValidationError(
                f"{path}: unexpected or over-occurring element "
                f"<{_local(children[idx].tag)}>"
            )
    elif kind == "all":
        counts: dict[str, int] = {}
        decls = {}
        for item in items:
            decl = schema.decl_for_ref(item)
            decls[decl.get("name")] = (item, decl)
            counts[decl.get("name")] = 0
        for ch in children:
            name = _local(ch.tag)
            if name not in decls:
                raise XsdValidationError(f"{path}: unexpected element <{name}>")
            item, decl = decls[name]
            counts[name] += 1
            _validate_element(schema, ch, decl, f"{path}/{name}")
        for name, (item, _decl) in decls.items():
            lo, hi = _occurs(item)
            if not (lo <= counts[name] <= hi):
                raise XsdValidationError(
                    f"{path}/{name}: occurs {counts[name]} outside [{lo}, {hi}]"
                )
    else:  # choice
        decls = {}
        for item in items:
            decl = schema.decl_for_ref(item)
            decls[decl.get("name")] = decl
        if len(children) < g_lo or len(children) > g_hi:
            raise XsdValidationError(
                f"{path}: choice occurs {len(children)} outside [{g_lo}, {g_hi}]"
            )
        for ch in children:
            name = _local(ch.tag)
            if name not in decls:
                raise XsdValidationError(f"{path}: unexpected element <{name}>")
            _validate_element(schema, ch, decls[name], f"{path}/{name}")


def validate_xml_against_xsd(xml_path: str, xsd_path: str) -> None:
    """Raise XsdValidationError when the document's element structure does
    not comply with the XSD (structural subset — see module docstring)."""
    schema = _Schema(ET.parse(xsd_path).getroot())
    doc_root = ET.parse(xml_path).getroot()
    root_name = _local(doc_root.tag)
    if root_name not in schema.global_elements:
        raise XsdValidationError(
            f"root element <{root_name}> is not declared in the schema"
        )
    _validate_element(schema, doc_root, schema.global_elements[root_name], root_name)
