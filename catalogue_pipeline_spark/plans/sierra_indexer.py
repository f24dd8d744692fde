"""Sierra indexer — the reporting-side splitter that turns one
SierraTransformable into per-record documents plus exploded varField /
fixedField sub-documents, with delete-by-query predicates for the pieces
that disappeared.

Reference: ``sierra_adapter/sierra_indexer/services/Splitter.scala:17-112``
(bib JSON augmented with the sorted item/holdings/order id lists; any
record in the transformable failing to parse fails the whole
transformable), ``models/IndexerRequest.scala:22-132`` (the five request
builders: main records to ``{prefix}_{recordType}`` with varFields/
fixedFields stripped and ``idWithCheckDigit`` added; varFields exploded
with their position into ``{prefix}_varfields`` under
``{recordType}-{id}-{position}`` ids; fixedFields exploded by code;
stale-position and code-not-in delete-by-query), and
``services/SierraJsonOps.scala`` (varFields/fixedFields/remainder/withId).

Spark-first: the arbitrary-keyed Sierra API JSON is handled entirely
JVM-side with variant ops — ``parse_json`` once per record, the object
read as ``map<string,variant>`` so unknown fields survive, ``map_filter``
for the remainder, ``posexplode`` for varFields — no per-row Python.  The
splitter is a pure narrow map over transformables; the only wide op in
the family is ``apply_index_deletions``'s join, keyed on the parent id
(the natural partitioning of both sides).  Field order inside emitted
JSON follows map-key order rather than the reference's insertion order;
consumers compare parsed values, never byte layouts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sierra_transform import sierra_check_digit

# TypedSierraRecordNumber's per-type prefix letters (Sierra's own id
# scheme: b=bib, i=item, c=checkin/holdings, o=order)
RECORD_TYPE_PREFIX = {"bibs": "b", "items": "i", "holdings": "c", "orders": "o"}


def with_check_digit(record_type: Column, record_id: Column) -> Column:
    """``TypedSierraRecordNumber.withCheckDigit``: prefix letter + the
    seven digits + the mod-11 check digit."""
    prefix = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in RECORD_TYPE_PREFIX.items() for x in kv]
        ),
        record_type,
    )
    return F.concat(prefix, record_id, sierra_check_digit(record_id))


def _obj(data: Column) -> Column:
    """Whole record JSON as map<string,variant> (unknown keys survive);
    malformed JSON → NULL (classified by the strict gate, not exploded
    mid-parse)."""
    return F.try_variant_get(F.try_parse_json(data), "$", "map<string,variant>")


def sierra_api_data(transformables: DataFrame, *, strict: bool = True) -> DataFrame:
    """``Splitter.getSierraApiData`` (:38-112): one transformable —
    ``(bib_id, bib_data, items/holdings/orders array<struct<id,data>>)`` —
    into per-record rows ``(record_type, id, id_with_check_digit, obj)``.

    The bib object gains ``itemIds``/``holdingsIds``/``orderIds`` (the
    sub-record ids, sorted, without check digits) so the reporting index
    can walk bib→children.  A transformable with no bib record emits only
    its sub-records.  Under ``strict`` (the reference behaviour) a record
    whose JSON does not parse fails the job — 'Could not parse all
    records'; lenient mode drops just the bad record."""
    ids_of = lambda col: F.array_sort(  # noqa: E731
        F.transform(F.coalesce(col, F.array()), lambda r: r.getField("id"))
    )
    with_ids = transformables.withColumn(
        "_sub_ids",
        F.struct(
            ids_of(F.col("items")).alias("itemIds"),
            ids_of(F.col("holdings")).alias("holdingsIds"),
            ids_of(F.col("orders")).alias("orderIds"),
        ),
    )
    # mapObject.add overwrites in the reference: drop any pre-existing id
    # keys before concat (map_concat rejects duplicates)
    bib_obj = F.map_concat(
        F.map_filter(
            _obj(F.col("bib_data")),
            lambda k, _: ~k.isin("itemIds", "holdingsIds", "orderIds"),
        ),
        F.create_map(
            F.lit("itemIds"),
            F.parse_json(F.to_json(F.col("_sub_ids.itemIds"))),
            F.lit("holdingsIds"),
            F.parse_json(F.to_json(F.col("_sub_ids.holdingsIds"))),
            F.lit("orderIds"),
            F.parse_json(F.to_json(F.col("_sub_ids.orderIds"))),
        ),
    )
    bibs = with_ids.filter(
        F.col("bib_id").isNotNull() & F.col("bib_data").isNotNull()
    ).select(
        F.lit("bibs").alias("record_type"),
        F.col("bib_id").alias("id"),
        F.col("bib_data").alias("_raw"),
        bib_obj.alias("obj"),
    )

    def subs(col_name: str, record_type: str) -> DataFrame:
        return with_ids.select(
            F.explode(F.coalesce(F.col(col_name), F.array())).alias("r")
        ).select(
            F.lit(record_type).alias("record_type"),
            F.col("r.id").alias("id"),
            F.col("r.data").alias("_raw"),
            _obj(F.col("r.data")).alias("obj"),
        )

    out = (
        bibs.unionByName(subs("items", "items"))
        .unionByName(subs("holdings", "holdings"))
        .unionByName(subs("orders", "orders"))
    )
    parse_failed = F.col("obj").isNull() & F.col("_raw").isNotNull()
    if strict:
        out = out.withColumn(
            "obj",
            F.when(
                parse_failed,
                F.raise_error(
                    F.concat(
                        F.lit("Could not parse all records: "),
                        F.col("record_type"),
                        F.lit("/"),
                        F.col("id"),
                    )
                ),
            ).otherwise(F.col("obj")),
        )
    else:
        out = out.filter(~parse_failed)
    return out.select(
        "record_type",
        "id",
        with_check_digit(F.col("record_type"), F.col("id")).alias(
            "id_with_check_digit"
        ),
        "obj",
    )


def _var_fields(obj: Column) -> Column:
    """``SierraJsonOps.varFields``: missing/invalid → empty list."""
    return F.coalesce(
        F.try_variant_get(F.element_at(obj, "varFields"), "$", "array<variant>"),
        F.array().cast("array<variant>"),
    )


def _fixed_fields(obj: Column) -> Column:
    """``SierraJsonOps.fixedFields``: missing/invalid → empty map."""
    return F.coalesce(
        F.try_variant_get(
            F.element_at(obj, "fixedFields"), "$", "map<string,variant>"
        ),
        F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<variant>")
        ),
    )


def _parent(df: DataFrame) -> Column:
    return F.to_json(
        F.struct(
            F.col("record_type").alias("recordType"),
            F.col("id").alias("id"),
            F.col("id_with_check_digit").alias("idWithCheckDigit"),
        )
    )


def indexer_main_records(api_data: DataFrame, index_prefix: str) -> DataFrame:
    """``IndexerRequest.mainRecords`` (:22-36): one doc per record into
    ``{prefix}_{recordType}``, keyed by the bare id; the source is the
    record minus varFields/fixedFields, plus ``idWithCheckDigit``."""
    remainder = F.map_filter(
        F.col("obj"),
        lambda k, _: ~k.isin("varFields", "fixedFields", "idWithCheckDigit"),
    )
    source = F.map_concat(
        remainder,
        F.create_map(
            F.lit("idWithCheckDigit"),
            F.parse_json(
                F.concat(F.lit('"'), F.col("id_with_check_digit"), F.lit('"'))
            ),
        ),
    )
    return api_data.select(
        F.concat(F.lit(index_prefix + "_"), F.col("record_type")).alias("index"),
        F.col("id").alias("doc_id"),
        F.to_json(source).alias("source"),
    )


def indexer_varfields(api_data: DataFrame, index_prefix: str) -> DataFrame:
    """``IndexerRequest.varFields`` (:53-73): each varField exploded with
    its position, id ``{recordType}-{id}-{position}``."""
    ex = api_data.select(
        "record_type",
        "id",
        "id_with_check_digit",
        F.posexplode(_var_fields(F.col("obj"))).alias("position", "var_field"),
    )
    return ex.select(
        F.lit(f"{index_prefix}_varfields").alias("index"),
        F.concat_ws("-", "record_type", "id", F.col("position").cast("string")).alias(
            "doc_id"
        ),
        F.concat(
            F.lit('{"parent":'),
            _parent(ex),
            F.lit(',"position":'),
            F.col("position").cast("string"),
            F.lit(',"varField":'),
            F.to_json(F.col("var_field")),
            F.lit("}"),
        ).alias("source"),
    )


def indexer_fixedfields(api_data: DataFrame, index_prefix: str) -> DataFrame:
    """``IndexerRequest.fixedFields`` (:97-114): each fixedField exploded
    by code, id ``{recordType}-{id}-{code}``."""
    ex = api_data.select(
        "record_type",
        "id",
        "id_with_check_digit",
        F.explode(_fixed_fields(F.col("obj"))).alias("code", "fixed_field"),
    )
    return ex.select(
        F.lit(f"{index_prefix}_fixedfields").alias("index"),
        F.concat_ws("-", "record_type", "id", "code").alias("doc_id"),
        F.concat(
            F.lit('{"parent":'),
            _parent(ex),
            F.lit(',"code":"'),
            F.col("code"),
            F.lit('"'),
            F.lit(',"fixedField":'),
            F.to_json(F.col("fixed_field")),
            F.lit("}"),
        ).alias("source"),
    )


def indexer_requests(api_data: DataFrame, index_prefix: str) -> DataFrame:
    """``Splitter.split``'s index side: main + varfields + fixedfields."""
    return (
        indexer_main_records(api_data, index_prefix)
        .unionByName(indexer_varfields(api_data, index_prefix))
        .unionByName(indexer_fixedfields(api_data, index_prefix))
    )


def indexer_deletions(api_data: DataFrame, index_prefix: str) -> DataFrame:
    """``varFieldDeletions``/``fixedFieldDeletions`` (:75-93,116-131) as
    predicate rows — per parent, one row per target index:

    * ``varfields``: delete docs with ``position >= stale_from`` (the
      current varField count — positions the new record no longer has);
    * ``fixedfields``: delete docs whose ``code`` is not in ``live_codes``.
    """
    per_parent = api_data.select(
        "record_type",
        "id",
        F.size(_var_fields(F.col("obj"))).alias("stale_from"),
        # the reference passes the codes as an (unordered) termsQuery set;
        # sorted here so the predicate row is deterministic
        F.array_sort(F.map_keys(_fixed_fields(F.col("obj")))).alias("live_codes"),
    )
    vf = per_parent.select(
        F.lit(f"{index_prefix}_varfields").alias("index"),
        "record_type",
        "id",
        "stale_from",
        F.lit(None).cast("array<string>").alias("live_codes"),
    )
    ff = per_parent.select(
        F.lit(f"{index_prefix}_fixedfields").alias("index"),
        "record_type",
        "id",
        F.lit(None).cast("int").alias("stale_from"),
        "live_codes",
    )
    return vf.unionByName(ff)


def apply_index_deletions(existing: DataFrame, deletions: DataFrame) -> DataFrame:
    """Run the delete-by-query predicates against an index table —
    ``existing``: ``(index, doc_id, record_type, id, position, code)``
    (position for varfield docs, code for fixedfield docs).  Returns the
    surviving rows; the join is keyed on ``(index, record_type, id)`` —
    parents without a deletion row are untouched."""
    d = deletions.select(
        F.col("index").alias("_d_index"),
        F.col("record_type").alias("_d_rt"),
        F.col("id").alias("_d_id"),
        "stale_from",
        "live_codes",
    )
    joined = existing.join(
        d,
        (existing["index"] == d["_d_index"])
        & (existing["record_type"] == d["_d_rt"])
        & (existing["id"] == d["_d_id"]),
        "left",
    )
    kill = (
        F.col("stale_from").isNotNull()
        & (F.col("position") >= F.col("stale_from"))
    ) | (
        F.col("live_codes").isNotNull()
        & ~F.array_contains(F.col("live_codes"), F.col("code"))
    )
    return joined.filter(~F.coalesce(kill, F.lit(False))).select(existing.columns)
