"""Fixed StructType schemas for every stage (SURVEY.md §1.3).

The reference keeps dynamic per-object attribute dicts
([PK naruhodo/backends/cabocha.py CaboChunk]); our build pins every stage
to a fixed columnar schema so Arrow batching, nested-schema pruning, and
the DuckDB oracle comparison all work.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- input: interleaved text + media documents [B BASELINE.json:15] ----
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'text' | 'media'
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)
DOCUMENTS_SPANS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# ---- sentences (post O7/O8) ----
SENTENCES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("sent_id", T.IntegerType(), False),
        T.StructField("sentence", T.StringType(), False),
    ]
)

# ---- chunks (post O11; mirrors reference CaboChunk fields, fixed) ----
# ctype codes (reference: chunk POS class [PK naruhodo/utils/dicts.py]):
CTYPE_NOUN = 0
CTYPE_VERB = 1
CTYPE_ADJ = 2
CTYPE_PRONOUN = 3
CTYPE_CONNECT = 4
CTYPE_OTHER = 5

# entity-type codes (reference NE dict [PK naruhodo/utils/dicts.py]):
ETYPE_UNKNOWN = 0
ETYPE_PERSON = 1
ETYPE_LOCATION = 2
ETYPE_ORG = 3
ETYPE_DATETIME = 4
ETYPE_QUANTITY = 5

# pronoun classes (reference pro field):
PRO_NONE = -1
PRO_PERSONAL = 0
PRO_DEMONSTRATIVE = 1
PRO_LOCATIVE = 2

CHUNKS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("sent_id", T.IntegerType(), False),
        T.StructField("chunk_id", T.IntegerType(), False),
        T.StructField("parent", T.IntegerType(), False),  # -1 = root
        T.StructField("surface", T.StringType(), False),
        T.StructField("main", T.StringType(), False),  # content head
        T.StructField("func", T.StringType(), False),  # case marker / prep
        T.StructField("ctype", T.IntegerType(), False),
        T.StructField("ne_type", T.IntegerType(), False),
        T.StructField("pro", T.IntegerType(), False),
        T.StructField("negative", T.BooleanType(), False),
        T.StructField("passive", T.BooleanType(), False),
        T.StructField("tense", T.StringType(), False),  # 'present' | 'past'
    ]
)

# ---- raw triples (post O12, pre-coref) ----
TRIPLES = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("sent_id", T.IntegerType(), False),
        T.StructField("pred_id", T.IntegerType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("subj", T.StringType(), True),
        T.StructField("subj_id", T.IntegerType(), True),
        T.StructField("obj", T.StringType(), True),
        T.StructField("obj_id", T.IntegerType(), True),
        T.StructField("negative", T.BooleanType(), False),
        T.StructField("passive", T.BooleanType(), False),
        T.StructField("tense", T.StringType(), False),
    ]
)

# ---- graph tables (SURVEY.md §1.3; written to Iceberg in prod) ----
DSG_NODES = "node_id string, doc_id string, sent_id int, chunk_id int, surface string, main string, ctype int"
DSG_EDGES = "src string, dst string, label string, doc_id string, sent_id int"
KSG_NODES = "node_id string, name string, rep string, etype int, pro int, count long"
KSG_EDGES = (
    "subj string, pred string, obj string, weight long,"
    " negative boolean, passive boolean"
)

# ---- manifest (O36: per-partition progress + lineage) ----
MANIFEST = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("doc_count", T.LongType(), False),
        T.StructField("triple_count", T.LongType(), False),
        T.StructField("input_fingerprint", T.StringType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
    ]
)
