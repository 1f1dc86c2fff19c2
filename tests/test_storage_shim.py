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

    def partitionedBy(self, *cols):
        self.log.append(("partitionedBy", len(cols)))
        return self

    def create(self):
        self.log.append(("create",))

    def createOrReplace(self):
        self.log.append(("createOrReplace",))

    def overwritePartitions(self):
        self.log.append(("overwritePartitions",))

    def append(self):
        self.log.append(("append",))


class _FakeDF:
    def __init__(self, log, spark):
        self.log = log
        self.sparkSession = spark

    def writeTo(self, name):
        self.log.append(("writeTo", name))
        return _FakeWriter(self.log)

    def __getitem__(self, c):
        return c


class _FakeCatalog:
    def __init__(self, log, exists=True):
        self.log = log
        self.exists = exists

    def tableExists(self, name):
        self.log.append(("tableExists", name))
        return self.exists


class _FakeReader:
    def __init__(self, log):
        self.log = log

    def table(self, name):
        self.log.append(("read.table", name))
        return "ICEBERG_TABLE"


class _FakeSpark:
    def __init__(self, log, exists=True):
        self.read = _FakeReader(log)
        self.catalog = _FakeCatalog(log, exists)

    def sql(self, q):
        self.read.log.append(("sql", q))


def test_iceberg_branch_routing_existing_table(monkeypatch):
    monkeypatch.setattr(storage, "_has_iceberg", lambda spark: True)
    log = _Log()
    fs = _FakeSpark(log, exists=True)
    df = _FakeDF(log, fs)

    # full overwrite (no partitions) → createOrReplace
    storage.write_table(df, "edges", "/nope", mode="overwrite")
    # partitioned overwrite → DYNAMIC overwritePartitions, never
    # createOrReplace (which would destroy other waves' partitions)
    storage.write_table(
        df, "raw", "/nope", mode="overwrite", partition_by=["part_id"]
    )
    # append on an existing table → plain append
    storage.write_table(df, "edges", "/nope", mode="append")
    assert storage.read_table(fs, "edges", "/nope") == "ICEBERG_TABLE"

    assert log == [
        ("tableExists", "kg.edges"),
        ("writeTo", "kg.edges"), ("using", "iceberg"), ("createOrReplace",),
        ("tableExists", "kg.raw"),
        ("writeTo", "kg.raw"), ("overwritePartitions",),
        ("tableExists", "kg.edges"),
        ("writeTo", "kg.edges"), ("append",),
        ("read.table", "kg.edges"),
    ]


def test_iceberg_branch_creates_missing_table(monkeypatch):
    """First-ever write (any mode) must CREATE: append() on a missing
    Iceberg table throws NoSuchTableException, and every fresh
    deployment's first manifest write IS an append."""
    monkeypatch.setattr(storage, "_has_iceberg", lambda spark: True)
    log = _Log()
    fs = _FakeSpark(log, exists=False)
    df = _FakeDF(log, fs)

    storage.write_table(df, "_manifest", "/nope", mode="append")
    storage.write_table(
        df, "raw", "/nope", mode="overwrite", partition_by=["part_id"]
    )
    assert log == [
        ("tableExists", "kg._manifest"),
        ("writeTo", "kg._manifest"), ("using", "iceberg"), ("create",),
        ("tableExists", "kg.raw"),
        ("writeTo", "kg.raw"), ("using", "iceberg"),
        ("partitionedBy", 1), ("create",),
    ]


def test_iceberg_delete_partitions_is_sql_delete(monkeypatch):
    monkeypatch.setattr(storage, "_has_iceberg", lambda spark: True)
    log = _Log()
    fs = _FakeSpark(log)
    storage.delete_partitions(fs, "raw", "/nope", "part_id", [3, 5])
    assert log == [
        ("tableExists", "kg.raw"),
        ("sql", "DELETE FROM kg.raw WHERE part_id IN (3, 5)"),
    ]
    # empty list: no statement issued, no existence probe
    storage.delete_partitions(fs, "raw", "/nope", "part_id", [])
    assert len(log) == 2


def test_iceberg_delete_partitions_missing_table_is_noop(monkeypatch):
    """ADVICE r02: the first run_partitioned wave on a fresh Iceberg
    deployment pre-drops before any table exists — DELETE on a missing
    table would abort the whole run."""
    monkeypatch.setattr(storage, "_has_iceberg", lambda spark: True)
    log = _Log()
    fs = _FakeSpark(log, exists=False)
    storage.delete_partitions(fs, "raw", "/nope", "part_id", [3])
    assert log == [("tableExists", "kg.raw")]  # probed, never DELETEd


def test_iceberg_delete_partitions_escapes_string_values(monkeypatch):
    """ADVICE r02: string partition values must be single-quoted with
    embedded quotes doubled — Python repr() of a value containing '
    emits a double-quoted form SQL parses as an identifier."""
    monkeypatch.setattr(storage, "_has_iceberg", lambda spark: True)
    log = _Log()
    fs = _FakeSpark(log)
    storage.delete_partitions(fs, "raw", "/nope", "src", ["a'b", "plain"])
    assert log == [
        ("tableExists", "kg.raw"),
        ("sql", "DELETE FROM kg.raw WHERE src IN ('a''b', 'plain')"),
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
