"""Sitemap source tests: protocol parse vectors, distributed writer
determinism/idempotence, and index-level shard pruning."""

import os

import pytest

from dbimport_spark.sources.sitemap import (
    parse_sitemap_index,
    parse_urlset,
    read_sitemaps,
    write_sitemap_shards,
)

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://x.org/a</loc><lastmod>2026-01-02T00:00:00Z</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc> https://x.org/b </loc></url>
  <url><lastmod>2026-01-03T00:00:00Z</lastmod></url>
</urlset>
"""


class TestParse:
    def test_urlset_fields_and_required_loc(self):
        rows = parse_urlset(URLSET)
        assert rows == [
            ("https://x.org/a", "2026-01-02T00:00:00Z", "daily", "0.8"),
            ("https://x.org/b", None, None, None),
        ]

    def test_urlset_without_namespace(self):
        rows = parse_urlset(
            b"<urlset><url><loc>https://y/1</loc></url></urlset>"
        )
        assert rows == [("https://y/1", None, None, None)]

    def test_index_parse(self):
        blob = (
            b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            b"<sitemap><loc>file:///tmp/s1.xml</loc>"
            b"<lastmod>2026-01-05T00:00:00Z</lastmod></sitemap>"
            b"<sitemap><loc>file:///tmp/s2.xml</loc></sitemap>"
            b"</sitemapindex>"
        )
        assert parse_sitemap_index(blob) == [
            ("file:///tmp/s1.xml", "2026-01-05T00:00:00Z"),
            ("file:///tmp/s2.xml", None),
        ]


@pytest.fixture()
def shard_dir(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")

    def entry(row):
        d = row.doc_id
        return (
            f"https://x.org/doc/{d}",
            f"2026-01-{d % 28 + 1:02d}T00:00:00Z",
            None,
            None,
        )

    out = str(tmp_path / "maps")
    index = write_sitemap_shards(df, out, entry, num_shards=4, key_col="doc_id")
    return out, index


class TestWriter:
    def test_roundtrip_all_rows(self, spark, shard_dir):
        _out, index = shard_dir
        got = read_sitemaps(spark, index).select("loc").collect()
        assert sorted(r.loc for r in got) == sorted(
            f"https://x.org/doc/{i}" for i in range(40)
        )

    def test_deterministic_bytes(self, spark, shard_dir, tmp_path):
        out, index = shard_dir
        df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")

        def entry(row):
            d = row.doc_id
            return (
                f"https://x.org/doc/{d}",
                f"2026-01-{d % 28 + 1:02d}T00:00:00Z",
                None,
                None,
            )

        out2 = str(tmp_path / "maps2")
        write_sitemap_shards(df, out2, entry, num_shards=4, key_col="doc_id")
        for name in sorted(os.listdir(out)):
            # the index embeds absolute shard paths — out != out2 by
            # construction; determinism is about the urlset SHARDS
            if not name.endswith(".xml") or name == "sitemap-index.xml":
                continue
            with open(os.path.join(out, name), "rb") as a, open(
                os.path.join(out2, name), "rb"
            ) as b:
                assert a.read() == b.read(), name

    def test_no_inprogress_leftovers(self, shard_dir):
        out, _ = shard_dir
        assert not [f for f in os.listdir(out) if f.endswith(".inprogress")]

    def test_index_lastmod_is_shard_max(self, shard_dir):
        _out, index = shard_dir
        with open(index, "rb") as fh:
            entries = parse_sitemap_index(fh.read())
        assert entries and all(lastmod is not None for _loc, lastmod in entries)


class TestShardPruning:
    def test_index_lastmod_prunes_whole_shards_not_rows(self, spark, tmp_path):
        """read_sitemaps does SHARD-level pruning only: a stale shard
        vanishes entirely, while old ENTRIES inside a surviving shard
        still come back (row filtering is the caller's job)."""
        out = str(tmp_path / "m")
        os.makedirs(out)
        old = (
            b"<urlset><url><loc>https://x/old1</loc>"
            b"<lastmod>2026-01-01T00:00:00Z</lastmod></url></urlset>"
        )
        mixed = (
            b"<urlset><url><loc>https://x/old2</loc>"
            b"<lastmod>2026-01-02T00:00:00Z</lastmod></url>"
            b"<url><loc>https://x/new</loc>"
            b"<lastmod>2026-02-01T00:00:00Z</lastmod></url></urlset>"
        )
        for name, blob in (("s-old.xml", old), ("s-mixed.xml", mixed)):
            with open(os.path.join(out, name), "wb") as fh:
                fh.write(blob)
        index = os.path.join(out, "sitemap-index.xml")
        with open(index, "w") as fh:
            fh.write(
                "<sitemapindex>"
                f"<sitemap><loc>file://{out}/s-old.xml</loc>"
                "<lastmod>2026-01-01T00:00:00Z</lastmod></sitemap>"
                f"<sitemap><loc>file://{out}/s-mixed.xml</loc>"
                "<lastmod>2026-02-01T00:00:00Z</lastmod></sitemap>"
                "</sitemapindex>"
            )
        got = read_sitemaps(
            spark, index, min_lastmod="2026-01-15T00:00:00Z"
        ).collect()
        locs = sorted(r.loc for r in got)
        assert locs == ["https://x/new", "https://x/old2"]

    def test_all_pruned_returns_empty_frame_with_schema(self, spark, tmp_path):
        index = str(tmp_path / "idx.xml")
        with open(index, "w") as fh:
            fh.write(
                "<sitemapindex><sitemap><loc>file:///nope.xml</loc>"
                "<lastmod>2026-01-01T00:00:00Z</lastmod></sitemap>"
                "</sitemapindex>"
            )
        df = read_sitemaps(spark, index, min_lastmod="2026-06-01T00:00:00Z")
        assert df.count() == 0
        assert "loc" in df.columns and "lastmod" in df.columns

    def test_shard_without_lastmod_never_pruned(self, spark, tmp_path):
        out = str(tmp_path / "m2")
        os.makedirs(out)
        with open(os.path.join(out, "s.xml"), "wb") as fh:
            fh.write(b"<urlset><url><loc>https://x/u</loc></url></urlset>")
        index = os.path.join(out, "i.xml")
        with open(index, "w") as fh:
            fh.write(
                f"<sitemapindex><sitemap><loc>file://{out}/s.xml</loc>"
                "</sitemap></sitemapindex>"
            )
        got = read_sitemaps(spark, index, min_lastmod="2099-01-01T00:00:00Z")
        assert [r.loc for r in got.collect()] == ["https://x/u"]
