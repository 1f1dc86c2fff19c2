"""O3 — web source (``parser.addUrls`` analog) as a Spark Python
DataSource.

Reference behavior: ``addUrls`` fetches each page with urllib, strips
markup with BeautifulSoup, and feeds the ``<p>`` text into the pipeline
[PK naruhodo/utils/scraper.py]. This sandbox has no network, so the
FETCH is an injectable callable (same honest-stub pattern as
ops/multimodal.py) — everything Spark-side is real: a registered
``naruhodo_web`` DataSource whose reader partitions the URL list across
executors (one fetch task per partition, the shape a polite distributed
crawler needs) and emits rows in the normative spans schema
[B BASELINE.json:15], so ``build_kg`` consumes it unchanged.

Usage::

    spark.dataSource.register(WebDocumentSource)
    docs = (spark.read.format("naruhodo_web")
                 .option("urls", "https://a|https://b")
                 .option("n_partitions", "8").load())

The default fetcher is deterministic fake content keyed by the URL (so
tests pin the full plumbing); production swaps it by registering a
subclass whose ``fetch`` does the real HTTP + HTML-to-text.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Normative spans schema (schemas.DOCUMENTS_SPANS) in DDL form — the
# DataSource API wants a schema string; kept in sync by a unit test.
_SPANS_DDL = (
    "doc_id string, spans array<struct<kind:string,text:string,"
    "media_ref:string,offset:int>>"
)


def fake_fetch(url: str) -> str:
    """Deterministic stand-in for urllib+BeautifulSoup page text
    (network is unavailable in this environment — documented stub)."""
    slug = url.rstrip("/").rsplit("/", 1)[-1] or "index"
    return f"the {slug} page. alice visited {slug}."


class _UrlPartition(InputPartition):
    def __init__(self, urls: list[str]):
        self.urls = urls


class WebDocumentReader(DataSourceReader):
    def __init__(self, options):
        raw = options.get("urls", "")
        self.urls = [u for u in raw.split("|") if u]
        self.n_partitions = int(options.get("n_partitions", "4"))

    def partitions(self):
        n = max(1, min(self.n_partitions, len(self.urls) or 1))
        buckets: list[list[str]] = [[] for _ in range(n)]
        for i, u in enumerate(self.urls):
            buckets[i % n].append(u)
        # never return []: PySpark substitutes [None] for an empty
        # partition list and read(None) crashes — no urls means one
        # empty partition and an empty DataFrame
        return [_UrlPartition(b) for b in buckets if b] or [_UrlPartition([])]

    def fetch(self, url: str) -> str:  # override point for real HTTP
        return fake_fetch(url)

    def read(self, partition: _UrlPartition):
        # runs ON AN EXECUTOR, one task per partition: the fetch fan-out
        # is the parallelism, exactly like the executor-side media fetch
        # in ops/multimodal.py
        for url in partition.urls:
            text = self.fetch(url)
            yield (url, [("text", text, "", 0)])


class WebDocumentSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "naruhodo_web"

    def schema(self) -> str:
        return _SPANS_DDL

    def reader(self, schema) -> WebDocumentReader:
        return WebDocumentReader(self.options)
