"""Source readers (SURVEY.md §2.1) — each returns a DataFrame of string-ish
columns plus a deterministic `_src_order`, mirroring the reference's
DataProvider contract (row iterator of Map<column, value> with significant
row order).

Scalability tiers:
* CSV / JSON / text-based: native Spark readers — splittable, predicate
  pushdown, distributed.
* XML / YAML / VCF: whole-file formats — parsed per file in parallel
  (one task per file via binaryFile); a single giant file is a single
  task, same as the reference's single-threaded StAX/snakeyaml readers.
* Excel / ODS / KDBX: inherently driver-side, small-by-nature
  (import-gated; the parse libs aren't in this container).
"""

from dbimport_spark.sources.csv import CsvSource, read_csv
from dbimport_spark.sources.json import read_json
from dbimport_spark.sources.xml import read_xml
from dbimport_spark.sources.yaml import read_yaml
from dbimport_spark.sources.vcf import read_vcf
from dbimport_spark.sources.inline import read_inline_data
from dbimport_spark.sources.compression import decompress_if_needed
from dbimport_spark.sources.wildcard import expand_wildcard, table_name_for_file

__all__ = [
    "CsvSource",
    "read_csv",
    "read_json",
    "read_xml",
    "read_yaml",
    "read_vcf",
    "read_inline_data",
    "decompress_if_needed",
    "expand_wildcard",
    "table_name_for_file",
]
