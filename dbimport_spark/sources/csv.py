"""CSV source with the reference's option surface.

Reference: /root/reference/src/main/java/de/soderer/dbimport/dataprovider/CsvDataProvider.java
(options at :48-62, line handling :200-224, synthetic `column_N` names when
no headers, null sentinel :211-213, underfill padding :216-218).

Fast path is ``spark.read.csv`` with an explicit all-string schema —
splittable, quote-aware, JVM-side. Line-arity validation (the reference
errors on under/overfilled lines unless ``-a``) rides on Spark's
PERMISSIVE corrupt-record column: any arity mismatch captures the raw
line, and a separator count on that raw line distinguishes underfill from
overfill (naive w.r.t. quoted separators on the malformed lines only —
matching the reference corpus).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbimport_spark.operators.order import with_src_order_by_file

CORRUPT_COL = "__corrupt_record"


@dataclass
class CsvSource:
    separator: str = ";"       # reference default (CsvDataProvider.java:49)
    quote: str = '"'
    escape: str | None = None  # None → doubled-quote escaping ("" inside quotes)
    no_headers: bool = False   # synth names column_1..column_N
    null_value_string: str = ""   # `-n`
    trim: bool = False            # `-t`
    allow_underfilled: bool = False  # `-a`
    encoding: str = "UTF-8"
    interpret_escape_sequences: bool = True  # \n, \t in values (`-noescapesequences` off)

    def _reader(self, spark: SparkSession):
        reader = (
            spark.read.option("sep", self.separator)
            .option("quote", self.quote)
            .option("escape", self.escape if self.escape else '"')
            .option("header", not self.no_headers)
            .option("encoding", self.encoding)
        )
        if self.null_value_string:
            reader = reader.option("nullValue", self.null_value_string)
        if self.trim:
            reader = reader.option("ignoreLeadingWhiteSpace", True).option(
                "ignoreTrailingWhiteSpace", True
            )
        return reader

    def column_names(self, spark: SparkSession, path: str) -> list[str]:
        probe = self._reader(spark).csv(path)
        if self.no_headers:
            return [f"column_{i + 1}" for i in range(len(probe.columns))]
        return probe.columns

    def read(
        self,
        spark: SparkSession,
        path: str,
        with_order: bool = True,
        keep_corrupt: bool = False,
    ) -> DataFrame:
        names = self.column_names(spark, path)
        schema = T.StructType(
            [T.StructField(n, T.StringType()) for n in names]
            + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        df = (
            self._reader(spark)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .schema(schema)
            .csv(path)
        )
        if self.trim:
            # The reference's CsvReader.withAlwaysTrim(trimData) trims EVERY
            # parsed value, quoted or not (CsvDataProvider.java:89). Spark's
            # ignoreLeading/TrailingWhiteSpace options only trim UNQUOTED
            # values, so a quoted padded cell would keep its padding —
            # finish the job JVM-side, then re-apply the null sentinel so a
            # quoted/padded sentinel still nulls (reference order: trim at
            # parse, sentinel compare after — DataProvider null handling).
            for c in names:
                col = F.trim(F.col(c))
                if self.null_value_string:
                    col = F.when(
                        col == self.null_value_string, F.lit(None)
                    ).otherwise(col)
                df = df.withColumn(c, col)
        if self.interpret_escape_sequences:
            # reference interprets \n \t \r inside CSV values
            # (DbImportDefinition.java:139-141)
            for c in names:
                col = F.col(c)
                for seq, repl in ((r"\\n", "\n"), (r"\\t", "\t"), (r"\\r", "\r")):
                    col = F.regexp_replace(col, seq, repl)
                df = df.withColumn(c, col)
        if not keep_corrupt:
            df = df.drop(CORRUPT_COL)
        if with_order:
            df = with_src_order_by_file(df)
        return df

    def read_with_validation(
        self, spark: SparkSession, path: str
    ) -> tuple[DataFrame, DataFrame]:
        """(valid, invalid) split on line arity.

        Overfilled lines are always invalid (structural error, exit 1 in
        the reference — DbImportTest_HSQL.java:369-395). Underfilled lines
        are padded with NULLs when ``allow_underfilled`` (`-a`,
        CsvDataProvider.java:216-218), else invalid.
        """
        # Spark requires caching when predicates reference the internal
        # corrupt-record column (SPARK-21610); also avoids re-parsing for
        # the two output branches.
        df = self.read(spark, path, with_order=True, keep_corrupt=True).cache()
        n_cols = len([c for c in df.columns if c not in (CORRUPT_COL, "_src_order")])
        # F.split takes a Java regex — quote the separator literally
        # (\Q...\E) so metacharacter separators like '|' or '.' don't
        # split on every character and misclassify arity.
        sep_literal = "\\Q" + self.separator + "\\E"
        tokens = F.size(F.split(F.col(CORRUPT_COL), F.lit(sep_literal), -1))
        corrupt = F.col(CORRUPT_COL).isNotNull()
        overfilled = corrupt & (tokens > n_cols)
        underfilled = corrupt & (tokens < n_cols)
        invalid_cond = overfilled if self.allow_underfilled else (overfilled | underfilled)
        valid = df.filter(~invalid_cond).drop(CORRUPT_COL)
        invalid = df.filter(invalid_cond).withColumnRenamed(CORRUPT_COL, "raw_line")
        return valid, invalid


def read_csv(spark: SparkSession, path: str, **opts) -> DataFrame:
    return CsvSource(**opts).read(spark, path)
