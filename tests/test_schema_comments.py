"""Column comments (StructField metadata) survive storage and evolution."""

from pyspark.sql import types as T

from etl_spark.lake import LakeTable
from etl_spark.schema import (
    COLUMN_COMMENTS,
    TRANSCRIPT_SCHEMA,
    describe_schema,
    evolve_schema,
    schema_from_json,
    schema_to_json,
)


def test_comments_in_schema_and_json_roundtrip():
    d = {r["name"]: r["comment"] for r in describe_schema(TRANSCRIPT_SCHEMA)}
    assert d == COLUMN_COMMENTS
    rt = schema_from_json(schema_to_json(TRANSCRIPT_SCHEMA))
    assert {r["name"]: r["comment"] for r in describe_schema(rt)} == COLUMN_COMMENTS


def test_comments_survive_evolution():
    # widen turn_idx int->long via an uncommented incoming schema: the
    # comment must ride along; a brand-new column arrives without one
    incoming = T.StructType(
        [
            T.StructField("turn_idx", T.LongType(), True),
            T.StructField("model", T.StringType(), True),
        ]
    )
    evolved = evolve_schema(TRANSCRIPT_SCHEMA, incoming)
    d = {r["name"]: r for r in describe_schema(evolved)}
    assert d["turn_idx"]["type"] == "bigint"
    assert d["turn_idx"]["comment"] == COLUMN_COMMENTS["turn_idx"]
    assert d["model"]["comment"] is None
    # unchanged columns keep their comments and the era id is stable for
    # a byte-identical schema
    assert d["text"]["comment"] == COLUMN_COMMENTS["text"]


def test_lake_table_describe(tmp_path):
    t = LakeTable.create(str(tmp_path / "t"), TRANSCRIPT_SCHEMA, n_buckets=4)
    rows = t.describe()
    by_name = {r["name"]: r for r in rows}
    assert by_name["conv_id"]["comment"] == COLUMN_COMMENTS["conv_id"]
    # system columns are present and annotated
    assert "batch_id" in by_name and by_name["batch_id"]["comment"]
    # era id unchanged when re-presenting the identical schema
    assert t.next_schema_id(t.user_schema()) == t.manifest().current_schema_id
