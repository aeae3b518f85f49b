"""YAML source: sequence-of-mappings, optional dataPath.

Reference: dataprovider/YamlDataProvider.java:32-302. No Spark built-in;
whole files parsed in parallel (one task per file), typed values preserved
(YAML carries ints/floats/bools/dates natively, like the reference's typed
variant at YamlDataProvider.java:57-120).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dbimport_spark.operators.order import with_src_order


def read_yaml(
    spark: SparkSession,
    path: str,
    data_path: str | None = None,
    with_order: bool = True,
) -> DataFrame:
    try:
        import yaml
    except ImportError as e:  # pragma: no cover
        raise NotImplementedError("PyYAML not installed") from e

    import glob as _glob

    rows: list[dict] = []
    for f in sorted(_glob.glob(path)):
        with open(f, encoding="utf-8") as fh:
            doc = yaml.safe_load(fh)
        if data_path:
            for part in data_path.strip("/").split("/"):
                doc = doc[part]
        if not isinstance(doc, list):
            raise ValueError("YAML import expects a sequence of mappings")
        rows.extend(doc)
    if not rows:
        raise ValueError(f"no YAML rows under {path}")
    # normalize keys across rows (dynamic columns like the reference)
    keys = sorted({k for r in rows for k in r})
    norm = [{k: (None if r.get(k) is None else r.get(k)) for k in keys} for r in rows]
    df = spark.createDataFrame(norm)
    df = df.select(*keys)
    if with_order:
        df = with_src_order(df)
    return df
