"""Spark adapter pinned against a stub pyspark (no cluster needed).

pyspark is absent from this environment, so these tests inject a minimal
fake pyspark package into sys.modules and assert the adapter reproduces
the reference jobs' exact I/O discipline: session conf
(goodssku_emb_bert_di.py:105-110), sql->toPandas pulls (:111-129), and the
repartition -> tmp-table -> INSERT OVERWRITE write sequence (:148-154).
"""

import re
import sys
import types

import pandas as pd
import pytest


# ---------------------------------------------------------------- stub


class FakeConf:
    def __init__(self):
        self.settings = {}

    def set(self, k, v):
        self.settings[k] = v
        return self


class FakeSC:
    def __init__(self):
        self.log_level = None

    def setLogLevel(self, level):
        self.log_level = level


class FakeResult:
    def __init__(self, df):
        self._df = df

    def toPandas(self):
        return self._df.copy()


class FakeWriter:
    def __init__(self, spark, df):
        self.spark = spark
        self.df = df
        self.saved_mode = None

    def mode(self, m):
        self.saved_mode = m
        return self

    def saveAsTable(self, name):
        assert self.saved_mode == "overwrite"
        self.spark.tables[name] = self.df.pdf.copy()
        self.spark.saved.append((name, self.saved_mode,
                                 self.df.n_partitions, self.df.schema))


class FakeSDF:
    def __init__(self, spark, pdf, schema):
        self.spark = spark
        self.pdf = pdf
        self.schema = schema
        self.n_partitions = None

    def repartition(self, n):
        self.n_partitions = n
        return self

    @property
    def write(self):
        return FakeWriter(self.spark, self)


class FakeCatalog:
    def __init__(self, spark):
        self._spark = spark

    def tableExists(self, name):
        return name in self._spark.tables


class FakeSpark:
    def __init__(self, conf, hive):
        self.conf = conf
        self.hive = hive
        self.sparkContext = FakeSC()
        self.catalog = FakeCatalog(self)
        self.tables = {}
        self.queries = []
        self.canned = {}
        self.saved = []

    def sql(self, q):
        self.queries.append(q)
        qs = " ".join(q.split())
        m = re.match(r"insert overwrite table (\S+) select \* from (\S+)",
                     qs, re.I)
        if m:
            self.tables[m.group(1)] = self.tables[m.group(2)].copy()
            return FakeResult(pd.DataFrame())
        m = re.match(r"insert into table (\S+) select \* from (\S+)",
                     qs, re.I)
        if m:
            self.tables[m.group(1)] = pd.concat(
                [self.tables[m.group(1)], self.tables[m.group(2)]],
                ignore_index=True)
            return FakeResult(pd.DataFrame())
        m = re.match(r"select \* from (\S+)$", qs, re.I)
        if m:
            return FakeResult(self.tables.get(m.group(1), pd.DataFrame()))
        m = re.match(r"select distinct (\S+) from (\S+)$", qs, re.I)
        if m:
            col, tbl = m.group(1), m.group(2)
            t = self.tables.get(tbl)
            if t is None or not len(t):
                return FakeResult(pd.DataFrame(columns=[col]))
            return FakeResult(t[[col]].drop_duplicates())
        return FakeResult(self.canned.get(qs, pd.DataFrame()))

    def createDataFrame(self, pdf, schema):
        assert list(pdf.columns) == [f.name for f in schema.fields]
        return FakeSDF(self, pdf, schema)


class FakeBuilder:
    last = None

    def config(self, conf=None):
        self._conf = conf
        return self

    def enableHiveSupport(self):
        self._hive = True
        return self

    def getOrCreate(self):
        # real Spark caches the session process-wide; the fake matches so
        # tests can pre-can tables before read_table()/_make_table_sink
        # build "their" session internally
        if FakeBuilder.last is None:
            FakeBuilder.last = FakeSpark(self._conf,
                                         getattr(self, "_hive", False))
        return FakeBuilder.last


class FakeStringType:
    def __repr__(self):
        return "StringType"


class FakeStructField:
    def __init__(self, name, dtype, nullable):
        self.name, self.dtype, self.nullable = name, dtype, nullable


class FakeStructType:
    def __init__(self, fields):
        self.fields = fields


@pytest.fixture
def pyspark_stub(monkeypatch):
    if "pyspark" in sys.modules and not isinstance(
            sys.modules["pyspark"], types.ModuleType):
        pytest.skip("real pyspark resident")
    root = types.ModuleType("pyspark")
    root.SparkConf = FakeConf
    sql_mod = types.ModuleType("pyspark.sql")

    class FakeSparkSession:
        builder = FakeBuilder()

    sql_mod.SparkSession = FakeSparkSession
    types_mod = types.ModuleType("pyspark.sql.types")
    types_mod.StringType = FakeStringType
    types_mod.StructField = FakeStructField
    types_mod.StructType = FakeStructType
    root.sql = sql_mod
    sql_mod.types = types_mod
    monkeypatch.setitem(sys.modules, "pyspark", root)
    monkeypatch.setitem(sys.modules, "pyspark.sql", sql_mod)
    monkeypatch.setitem(sys.modules, "pyspark.sql.types", types_mod)
    FakeSparkSession.builder = FakeBuilder()  # fresh per test
    FakeBuilder.last = None
    yield root


# ---------------------------------------------------------------- tests


def test_pyspark_absent_raises_clear_error():
    if "pyspark" in sys.modules:
        pytest.skip("pyspark resident in this interpreter")
    from multimodalsimilar_tpu.pipelines.spark import spark_session
    with pytest.raises(ImportError, match="parquet"):
        spark_session("x")


def test_session_conf_matches_reference(pyspark_stub):
    from multimodalsimilar_tpu.pipelines.spark import spark_session
    spark = spark_session("goodssku_emb_calc_bert",
                          conf={"spark.executor.memory": "8g"})
    assert spark.hive is True
    assert spark.conf.settings["spark.app.name"] == "goodssku_emb_calc_bert"
    assert spark.conf.settings["spark.ui.port"] == "4060"
    assert spark.conf.settings["spark.executor.memory"] == "8g"
    assert spark.sparkContext.log_level == "ERROR"


def test_source_pull_roundtrips_pandas(pyspark_stub, capsys):
    from multimodalsimilar_tpu.pipelines.spark import (SparkTableSource,
                                                       spark_session)
    spark = spark_session("pull")
    q = "select goods_sku, title from dim.dim_sku_sn where dt='2026-08-17'"
    spark.canned[q] = pd.DataFrame(
        {"goods_sku": ["a", "b"], "title": ["t1", "t2"]})
    df = SparkTableSource(spark).sql(q)
    assert list(df["goods_sku"]) == ["a", "b"]
    assert spark.queries == [q]
    assert "2 rows" in capsys.readouterr().out


def test_sink_overwrite_uses_tmp_table_and_insert_overwrite(pyspark_stub):
    from multimodalsimilar_tpu.pipelines.spark import (SparkTableSink,
                                                       spark_session)
    spark = spark_session("write")
    # the reference scenario: the warehouse target table pre-exists (DDL)
    spark.tables["dm_recommend.goodssku_embedding_bert"] = pd.DataFrame(
        columns=["goods_sku", "bert_emb", "modifydate"])
    sink = SparkTableSink(spark, "dm_recommend.goodssku_embedding_bert",
                          key_col="goods_sku")
    df = pd.DataFrame({"goods_sku": ["a", "b"],
                       "bert_emb": ["[1,2]", "[3,4]"],
                       "modifydate": ["2026-08-17"] * 2})
    sink.overwrite(df)
    # staged through tmp.tmp_<basename> with repartition(3000), then
    # INSERT OVERWRITE into the target (goodssku_emb_bert_di.py:148-154)
    (name, mode, nparts, schema), = spark.saved
    assert name == "tmp.tmp_goodssku_embedding_bert"
    assert (mode, nparts) == ("overwrite", 3000)
    assert spark.queries[-1].split() == (
        "insert overwrite table dm_recommend.goodssku_embedding_bert "
        "select * from tmp.tmp_goodssku_embedding_bert").split()
    out = spark.tables["dm_recommend.goodssku_embedding_bert"]
    assert list(out["goods_sku"]) == ["a", "b"]
    # all-string schema, key column non-nullable (reference :139-143)
    by_name = {f.name: f for f in schema.fields}
    assert not by_name["goods_sku"].nullable
    assert by_name["bert_emb"].nullable and by_name["modifydate"].nullable


def test_sink_existing_keys_and_incremental_append(pyspark_stub):
    from multimodalsimilar_tpu.pipelines.spark import (SparkTableSink,
                                                       spark_session)
    spark = spark_session("inc")
    sink = SparkTableSink(spark, "dm_recommend.goodssku_embedding_bert",
                          key_col="goods_sku")
    # brand-new table: ParquetTableSink contract (empty, not a traceback)
    assert sink.existing_keys("goods_sku") == set()
    assert sink.read().empty
    # first write creates the target
    sink.append(pd.DataFrame({"goods_sku": ["a", "b"],
                              "bert_emb": ["[1]", "[2]"]}))
    assert sink.existing_keys("goods_sku") == {"a", "b"}
    # subsequent appends (incremental_export flushes every flush_rows, so
    # key-disjointness is the caller's contract via existing_keys): staged
    # tmp table + INSERT INTO — the append must NOT re-read the target or
    # INSERT OVERWRITE it (quadratic warehouse I/O on a backfill)
    n_q = len(spark.queries)
    sink.append(pd.DataFrame({"goods_sku": ["c"], "bert_emb": ["[3]"]}))
    new_q = [" ".join(q.split()) for q in spark.queries[n_q:]]
    assert any(q.startswith("insert into table "
                            "dm_recommend.goodssku_embedding_bert")
               for q in new_q)
    assert not any("insert overwrite" in q for q in new_q)
    assert not any(q.startswith("select * from dm_recommend") for q in new_q)
    out = (spark.tables["dm_recommend.goodssku_embedding_bert"]
           .sort_values("goods_sku"))
    assert list(out["goods_sku"]) == ["a", "b", "c"]
    assert list(out["bert_emb"]) == ["[1]", "[2]", "[3]"]


def test_read_table_hive_and_hivesql_uris(pyspark_stub, capsys):
    """Every --data flag accepts warehouse addresses: hive://db.table pulls
    the whole table, hivesql://<SQL> runs the reference jobs' arbitrary
    dt-filtered pulls (nlp_infer.py:112-116) — both through the ONE cached
    SparkSession."""
    from multimodalsimilar_tpu.data.datasets import read_table
    from multimodalsimilar_tpu.pipelines.spark import spark_session

    spark = spark_session("pre")     # caches; read_table reuses it
    spark.tables["dim.dim_sku_sn"] = pd.DataFrame(
        {"goods_sku": ["a", "b"], "spu_name": ["t1", "t2"]})
    df = read_table("hive://dim.dim_sku_sn", require=["goods_sku"])
    assert list(df["spu_name"]) == ["t1", "t2"]
    assert spark.queries[-1] == "select * from dim.dim_sku_sn"

    q = "select goods_sku from dim.dim_sku_sn where dt = '2026-08-17'"
    spark.canned[q] = pd.DataFrame({"goods_sku": ["c"]})
    df2 = read_table("hivesql://" + q)
    assert list(df2["goods_sku"]) == ["c"]


def test_read_table_hive_missing_column_error(pyspark_stub):
    from multimodalsimilar_tpu.data.datasets import InputError, read_table
    from multimodalsimilar_tpu.pipelines.spark import spark_session

    spark = spark_session("pre")
    spark.tables["dim.t"] = pd.DataFrame({"goods_sku": ["a"]})
    with pytest.raises(InputError, match="missing column"):
        read_table("hive://dim.t", require=["spu_name"])


def test_cli_table_sink_routing(pyspark_stub, tmp_path):
    """cli._make_table_sink: hive:// -> SparkTableSink (key non-nullable),
    plain paths -> the local parquet stand-in."""
    from multimodalsimilar_tpu.cli import _make_table_sink
    from multimodalsimilar_tpu.pipelines.sinks import ParquetTableSink
    from multimodalsimilar_tpu.pipelines.spark import SparkTableSink

    sink = _make_table_sink("hive://dm_recommend.goodssku_embedding_bert",
                            key_col="goods_sku")
    assert isinstance(sink, SparkTableSink)
    assert sink.table == "dm_recommend.goodssku_embedding_bert"
    assert sink.key_col == "goods_sku"
    assert sink.tmp_table == "tmp.tmp_goodssku_embedding_bert"
    local = _make_table_sink(str(tmp_path / "t.parquet"))
    assert isinstance(local, ParquetTableSink)


def test_cli_embed_incremental_hive_end_to_end(pyspark_stub, tmp_path):
    """`cli embed incremental --data hive://... --table hive://...` runs the
    goodssku_emb_fasttext_di job shape fully against the warehouse seams:
    pull via spark.sql, skip-existing keys from the target table, write via
    tmp table + INSERT OVERWRITE."""
    import pickle

    from multimodalsimilar_tpu.cli import main
    from multimodalsimilar_tpu.models.fasttext import train_supervised
    from multimodalsimilar_tpu.pipelines.spark import spark_session

    model = train_supervised(["红豆 薏米 粥", "鲜奶 面包"], [0, 1],
                             dim=8, epochs=1)
    mp = tmp_path / "ft.pkl"
    with open(mp, "wb") as f:
        pickle.dump(model, f)

    spark = spark_session("pre")
    spark.tables["dim.dim_sku_sn"] = pd.DataFrame(
        {"goods_sku": ["a", "b", "c"],
         "spu_name": ["红豆薏米粥", "鲜奶面包", "冰糖雪梨"]})
    # 'a' already embedded -> must be skipped (same schema the export
    # writes: INSERT INTO requires it on real Hive)
    spark.tables["dm_recommend.goodssku_embedding_fasttext"] = pd.DataFrame(
        {"goods_sku": ["a"], "embedding": ["[0]"], "dt": ["2026-08-17"]})
    main(["embed", "incremental", "--kind", "fasttext",
          "--fasttext_model", str(mp),
          "--data", "hive://dim.dim_sku_sn",
          "--table", "hive://dm_recommend.goodssku_embedding_fasttext",
          "--dt", "2026-08-18"])
    out = spark.tables["dm_recommend.goodssku_embedding_fasttext"]
    assert sorted(out["goods_sku"]) == ["a", "b", "c"]
    # the pre-existing row kept its embedding (skip-existing semantics)
    assert out[out.goods_sku == "a"]["embedding"].iloc[0] == "[0]"
    assert any("insert into table "
               "dm_recommend.goodssku_embedding_fasttext" in " ".join(
                   q.split()) for q in spark.queries)


def test_stage_fills_nan_with_empty_string(pyspark_stub):
    """bulk_export's outer merge leaves NaN where a key misses a tower;
    the sink must write '' (goodssku_emb.py:185 fillna('')), never the
    literal 'nan' astype(str) would produce."""
    import numpy as np

    from multimodalsimilar_tpu.pipelines.spark import (SparkTableSink,
                                                       spark_session)
    spark = spark_session("w")
    sink = SparkTableSink(spark, "dm.t", key_col="goods_sku")
    sink.overwrite(pd.DataFrame({"goods_sku": ["a", "b"],
                                 "bert_emb": ["[1]", np.nan],
                                 "cv_emb": [np.nan, "[2]"]}))
    out = spark.tables["dm.t"].sort_values("goods_sku")
    assert list(out["bert_emb"]) == ["[1]", ""]
    assert list(out["cv_emb"]) == ["", "[2]"]


def test_exists_propagates_transient_errors(pyspark_stub):
    """A metastore/connection error during _exists must RAISE: swallowing
    it would route append() into the create branch, whose
    mode('overwrite').saveAsTable silently replaces the whole warehouse
    table with one flush chunk."""
    from multimodalsimilar_tpu.pipelines.spark import (SparkTableSink,
                                                       spark_session)
    spark = spark_session("err")
    spark.tables["dm.t"] = pd.DataFrame({"goods_sku": ["a"],
                                         "embedding": ["[1]"]})
    sink = SparkTableSink(spark, "dm.t", key_col="goods_sku")

    def boom(name):
        raise RuntimeError("metastore connection reset")

    spark.catalog.tableExists = boom
    with pytest.raises(RuntimeError, match="metastore"):
        sink.append(pd.DataFrame({"goods_sku": ["b"],
                                  "embedding": ["[2]"]}))
    # the pre-existing table is untouched
    assert list(spark.tables["dm.t"]["goods_sku"]) == ["a"]
