"""storage.py branch selection (VERDICT r01 "What's missing" #6): no
Iceberg jar exists on this box, so the ``writeTo(...).using("iceberg")``
branch can never execute for real — these tests pin the ROUTING with
duck-typed fakes: catalog configured → Iceberg writeTo/read.table path;
no catalog → parquet path."""

from naruhodo_spark import storage


class _Log(list):
    pass


class _FakeWriter:
    def __init__(self, log):
        self.log = log

    def using(self, fmt):
        self.log.append(("using", fmt))
        return self

    def createOrReplace(self):
        self.log.append(("createOrReplace",))

    def append(self):
        self.log.append(("append",))


class _FakeDF:
    def __init__(self, log, spark):
        self.log = log
        self.sparkSession = spark

    def writeTo(self, name):
        self.log.append(("writeTo", name))
        return _FakeWriter(self.log)


class _FakeCatalog:
    def __init__(self, log):
        self.log = log

    def tableExists(self, name):
        self.log.append(("tableExists", name))
        return True


class _FakeReader:
    def __init__(self, log):
        self.log = log

    def table(self, name):
        self.log.append(("read.table", name))
        return "ICEBERG_TABLE"


class _FakeSpark:
    def __init__(self, log):
        self.read = _FakeReader(log)
        self.catalog = _FakeCatalog(log)


def test_iceberg_branch_routing(monkeypatch):
    monkeypatch.setattr(storage, "_has_iceberg", lambda spark: True)
    log = _Log()
    fs = _FakeSpark(log)
    df = _FakeDF(log, fs)

    storage.write_table(df, "edges", "/nope", mode="overwrite")
    storage.write_table(df, "edges", "/nope", mode="append")
    assert storage.read_table(fs, "edges", "/nope") == "ICEBERG_TABLE"
    assert storage.table_exists(fs, "edges", "/nope") is True

    assert log == [
        ("writeTo", "kg.edges"), ("using", "iceberg"), ("createOrReplace",),
        ("writeTo", "kg.edges"), ("using", "iceberg"), ("append",),
        ("read.table", "kg.edges"),
        ("tableExists", "kg.edges"),
    ]


def test_parquet_branch_is_default(spark, tmp_path):
    """Without the catalog conf, _has_iceberg is False on a real session
    and writes land as parquet under base/name."""
    assert storage._has_iceberg(spark) is False
    df = spark.range(3).toDF("x")
    storage.write_table(df, "t1", str(tmp_path))
    assert (tmp_path / "t1").exists()
    assert storage.read_table(spark, "t1", str(tmp_path)).count() == 3
    assert storage.table_exists(spark, "t1", str(tmp_path)) is True
    assert storage.table_exists(spark, "missing", str(tmp_path)) is False
