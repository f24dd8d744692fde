"""Sierra transformer remainder: shelfmark, 856 electronic resources,
773/774 collection paths, on-order items and holdings objects.

These are the last Sierra transformer families the round-3 survey listed as
unported.  All are whole-stage-codegen column expressions over the
already-parsed bib/item/order/holdings structs — one ``from_json`` per
record type, zero shuffles inside a family, per-bib rollups as ordinary
groupBy aggregates (shuffle on ``bib_id`` only).  The single Python path is
the existing Arrow-batched holdings-enumeration UDF
(``functions/holdings.py``), reused per *holdings record* — never on the
per-event hot path.

Reference semantics carried over (file:line under
pipeline/transformer/transformer_sierra/src/main/scala/.../transformers and
pipeline/transformer/transformer_marc_common/.../transformers):

* shelfmark    — ``SierraShelfmark.scala:8-88``: item 949 (fieldTag 'c')
                 $a trimmed; suppressed entirely for Archives & Manuscripts
                 bibs (materialType 'h'); with an iconographic number the
                 item shelfmark survives ONLY when it extends the i-number
                 with a '.'-suffix (common-prefix rule), otherwise dropped.
* electronic   — ``SierraElectronicResources.scala:33-97`` +
  resources       ``MarcElectronicResources.scala:60-185``: one item per
                 856 with EXACTLY ONE URL-shaped $u; label = $z/$y/$3
                 contents in document order, trimmed, ' '-joined; a label
                 of ≤7 words containing access/view/connect becomes the
                 location linkText (with the reference's literal cleanup
                 table), anything else the item title; ind2='2' marks a
                 related resource.  URL-shaped is a known-scheme check —
                 the reference delegates to ``java.net.URL`` (scheme
                 whitelist), re-expressed as a regex.
* collection   — ``MarcCollectionPath.scala:69-222``: records linked by
  path            773/774 $w; host path = ``host/$g-token_own001``, '$g'
                 tokenised (spaces→'_', non-[0-9a-zA-Z_] stripped, '_'
                 suffix), '(Wcat)' prefix stripped from ids; a record with
                 constituents and no host roots the hierarchy at its own
                 001; self-referential hosts are ignored.
* on-order     — ``SierraItemsOnOrder.scala:44-161``: only when the bib has
  items           no item records AND no CAT DATE (fixed field 28); live
                 orders sorted by order number; STATUS (ff 20) o/c/a with
                 no RDATE (ff 17) → "Ordered for Wellcome Collection
                 [on <d MMMM yyyy>]" (ODATE ff 13); STATUS 'a' with RDATE →
                 "Awaiting cataloguing for Wellcome Collection"; anything
                 else ignored; duplicates removed, first occurrence wins.
* holdings     — ``SierraHoldings.scala:31-282``: live holdings records
                 split on fixed field 40 'elro' (padded) into digital vs
                 physical; physical = 866 $a description prepended to the
                 853/863 enumeration, 866 $z note, location from the
                 ff-40 code via the location-types table (+ 949 $a
                 shelfmark); digital = 856 items (above) re-shaped into
                 Holdings rows sorted by check-digit id, then per-URL
                 compatibility merge (unique-or-absent note/linkText and a
                 single distinct enumeration collapse into one row, else
                 all rows are kept).

``LOCATION_NAMES`` is a representative slice of the reference's 400-row
``location-types.csv`` *data* resource (codes exercised by its own tests
plus the high-traffic stores); a deployment would load the full CSV with
``spark.read.csv`` into the same map — the rule logic is code-independent
of the table contents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sierra_transform import (
    SIERRA_BIB_SCHEMA,
    _location_type,
    _SUBFIELDS_T,
    sierra_check_digit,
)

_VARFIELDS_T = SIERRA_BIB_SCHEMA["varFields"].dataType

# location-types.csv (transformer_sierra/src/main/resources/location-types.csv)
LOCATION_NAMES = {
    "acqi": "Info Service acquisitions",
    "acql": "Wellcome Library",
    "arch": "Archives Collection",
    "bwith": "bound in above",
    "cwith": "Contained in above",
    "digi": "Digitised Collections",
    "dlnk": "Digitised content",
    "elro": "Online",
    "hgser": "Offsite",
    "sgser": "Closed stores journals",
    "sicon": "Closed stores Iconographic",
    "sobhi": "Closed stores P.B. Hindi",
    "stax": "Closed stores",
    "swms1": "Closed stores WMS 1",
    "swms2": "Closed stores WMS 2",
    "swms3": "Closed stores WMS 3",
    "swms4": "Closed stores WMS 4",
}


def _vfs_tag(varfields: Column, tag: str) -> Column:
    return F.filter(
        F.coalesce(varfields, F.array().cast(_VARFIELDS_T)),
        lambda vf: vf.getField("marcTag") == tag,
    )


def _sub_vals(vf: Column, *tags: str) -> Column:
    return F.transform(
        F.filter(
            F.coalesce(vf.getField("subfields"), F.array().cast(_SUBFIELDS_T)),
            lambda s: s.getField("tag").isin(*tags) & s.getField("content").isNotNull(),
        ),
        lambda s: s.getField("content"),
    )


# ------------------------------------------------------------- shelfmark

def item_shelfmark_raw(item_varfields: Column) -> Column:
    """949 (fieldTag 'c') $a, head, trimmed (SierraShelfmark.scala:51-73)."""
    vfs = F.filter(
        F.coalesce(item_varfields, F.array().cast(_VARFIELDS_T)),
        lambda vf: (vf.getField("marcTag") == "949")
        & (vf.getField("fieldTag") == "c"),
    )
    heads = F.flatten(F.transform(vfs, lambda vf: _sub_vals(vf, "a")))
    return F.trim(F.try_element_at(heads, F.lit(1)))


def shelfmark_from_raw(
    material_type_code: Column, iconographic_number: Column, raw: Column
) -> Column:
    """SierraShelfmark.scala:8-49 — bib×item interaction rules, applied to
    an already-extracted item shelfmark."""
    prefix = F.concat(iconographic_number, F.lit("."))
    extends_inumber = (
        raw.isNotNull() & raw.startswith(prefix) & (raw != prefix)
    )
    return (
        F.when(material_type_code == "h", F.lit(None).cast("string"))
        .when(iconographic_number.isNotNull() & extends_inumber, raw)
        .when(iconographic_number.isNotNull(), F.lit(None).cast("string"))
        .otherwise(raw)
    )


def shelfmark_expr(
    material_type_code: Column, iconographic_number: Column, item_varfields: Column
) -> Column:
    """SierraShelfmark.scala:8-88 over the raw item varFields."""
    return shelfmark_from_raw(
        material_type_code, iconographic_number, item_shelfmark_raw(item_varfields)
    )


def sierra_items_with_bib(items: DataFrame, bibs: DataFrame) -> DataFrame:
    """sierra_items rows plus the bib-resolved ``shelfmark`` column —
    SierraPhysicalLocation.scala:50 wires SierraShelfmark(bibData,
    itemData) into every physical location.  A plain shuffle join on
    bib_id (both sides are bib-cardinality; no broadcast)."""
    from .sierra_transform import _iconographic_number_expr, sierra_items

    rows = sierra_items(items)
    bib = F.from_json(F.col("content"), SIERRA_BIB_SCHEMA)
    battrs = bibs.select(
        F.col("id").alias("bib_id"),
        bib.getField("materialType").getField("code").alias("_mat_code"),
        _iconographic_number_expr(bib).alias("_icono"),
    )
    joined = rows.join(battrs, "bib_id", "left")
    return joined.withColumn(
        "shelfmark",
        shelfmark_from_raw(
            F.col("_mat_code"), F.col("_icono"), F.col("shelfmark_raw")
        ),
    ).drop("_mat_code", "_icono")


# ------------------------------------------- 856 electronic resources

# java.net.URL accepts only registered schemes (MarcElectronicResources
# .scala:128-129 `new URL(s)`); the practical set in catalogue data:
_URL_RE = r"^(https?|ftp|file|jar|mailto):\S+$"

_CTA_WORDS = ["access", "view", "connect"]


def _clean_link_text(label: Column) -> Column:
    """The literal cleanup chain, MarcElectronicResources override in
    SierraElectronicResources.scala:70-92 (order preserved)."""
    c = F.regexp_replace(label, r"\.$", "")
    c = F.regexp_replace(c, r":$", "")
    c = F.regexp_replace(c, r"^view ", "View ")
    for src, dst in [
        ("VIEW FULL TEXT", "View full text"),
        ("via  MyiLibrary", "via MyiLibrary"),
        ("youtube", "YouTube"),
        ("View resource {PDF", "View resource [PDF"),
        ("View resource 613.7 KB]", "View resource [613.7 KB]"),
    ]:
        c = F.replace(c, F.lit(src), F.lit(dst))
    return c


def electronic_resources_expr(varfields: Column) -> Column:
    """array<struct<url,title,link_text,relationship>> — one entry per
    usable 856 field, in document order."""

    def one(vf):
        urls = _sub_vals(vf, "u")
        url = F.try_element_at(urls, F.lit(1))
        ok = (F.size(urls) == 1) & url.rlike(_URL_RE)
        label = F.array_join(
            F.transform(_sub_vals(vf, "z", "y", "3"), lambda c: F.trim(c)), " "
        )
        # Scala's String.split(" ") drops trailing empty tokens (limit 0)
        n_words = F.size(F.split(F.regexp_replace(label, r" +$", ""), " ", -1))
        low = F.lower(label)
        is_cta = (n_words <= 7) & F.coalesce(
            *[F.when(low.contains(w), F.lit(True)) for w in _CTA_WORDS],
            F.lit(False),
        )
        has_label = label != ""
        return F.when(
            ok,
            F.struct(
                url.alias("url"),
                F.when(has_label & ~is_cta, label).alias("title"),
                F.when(has_label & is_cta, _clean_link_text(label)).alias(
                    "link_text"
                ),
                F.when(vf.getField("ind2") == "2", F.lit("RelatedResource"))
                .otherwise(F.lit("Resource"))
                .alias("relationship"),
            ),
        )

    return F.filter(
        F.transform(_vfs_tag(varfields, "856"), one), lambda s: s.isNotNull()
    )


# --------------------------------------------------- 773/774 collection path

def collection_path_expr(bib: Column) -> Column:
    """MarcCollectionPath.scala:69-222 → path string (label is always
    absent in the reference output) or NULL."""
    vfs = bib.getField("varFields")
    f773 = _vfs_tag(vfs, "773")
    f774 = _vfs_tag(vfs, "774")
    has_w = lambda vf: F.size(_sub_vals(vf, "w")) > 0  # noqa: E731
    any_w = (F.size(F.filter(f773, has_w)) > 0) | (
        F.size(F.filter(f774, has_w)) > 0
    )
    own = F.trim(
        F.try_element_at(
            F.transform(_vfs_tag(vfs, "001"), lambda vf: vf.getField("content")),
            F.lit(1),
        )
    )
    host_field = F.try_element_at(F.filter(f773, has_w), F.lit(1))
    host_id = F.trim(
        F.regexp_replace(
            F.try_element_at(_sub_vals(host_field, "w"), F.lit(1)),
            r"^\(Wcat\)",
            "",
        )
    )
    g = F.try_element_at(_sub_vals(host_field, "g"), F.lit(1))
    g_token = F.when(
        g.isNotNull(),
        F.concat(
            F.regexp_replace(F.translate(g, " ", "_"), r"[^0-9a-zA-Z_]", ""),
            F.lit("_"),
        ),
    ).otherwise(F.lit(""))
    host_path = F.when(
        host_field.isNotNull() & (host_id != own),
        F.concat(host_id, F.lit("/"), g_token, own),
    )
    has_constituents = F.size(f774) > 0
    return F.when(
        any_w & own.isNotNull() & (own != ""),
        F.when(~has_constituents, host_path)
        .when(host_path.isNotNull(), host_path)
        .otherwise(own),
    )


# ------------------------------------------------------------ on-order items

from pyspark.sql import types as T  # noqa: E402

_FF_T = T.MapType(
    T.StringType(),
    T.StructType(
        [
            T.StructField("label", T.StringType()),
            T.StructField("value", T.StringType()),
            T.StructField("display", T.StringType()),
        ]
    ),
)

SIERRA_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("suppressed", T.BooleanType()),
        T.StructField("fixedFields", _FF_T),
    ]
)

SIERRA_HOLDINGS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("deleted", T.BooleanType()),
        T.StructField("suppressed", T.BooleanType()),
        T.StructField("fixedFields", _FF_T),
        T.StructField("varFields", _VARFIELDS_T),
    ]
)


def _ff_value(rec: Column, code: str) -> Column:
    return F.try_element_at(rec.getField("fixedFields"), F.lit(code)).getField(
        "value"
    )


def order_item_label(order: Column) -> Column:
    """Per-order on-order message, or NULL when the order is ignored
    (SierraItemsOnOrder.scala:66-125).  Dates parse leniently enough to
    accept unpadded components (SimpleDateFormat default)."""
    status = _ff_value(order, "20")
    odate = F.try_to_date(_ff_value(order, "13"), "yyyy-M-d")
    rdate = F.try_to_date(_ff_value(order, "17"), "yyyy-M-d")
    ordered_msg = F.when(
        odate.isNotNull(),
        F.concat(
            F.lit("Ordered for Wellcome Collection on "),
            F.date_format(odate, "d MMMM yyyy"),
        ),
    ).otherwise(F.lit("Ordered for Wellcome Collection"))
    return (
        F.when(status.isin("o", "c", "a") & rdate.isNull(), ordered_msg)
        .when(
            (status == "a") & rdate.isNotNull(),
            F.lit("Awaiting cataloguing for Wellcome Collection"),
        )
    )


def items_on_order(
    bibs: DataFrame, orders: DataFrame, items: DataFrame | None = None
) -> DataFrame:
    """(bib_id, order_items array<string>) — one label per surviving order,
    sorted by order number, deduped first-occurrence; empty when the bib has
    any item records or a CAT DATE (fixed field 28).

    bibs(id, content = Sierra bib JSON), orders(order_id, bib_id, content),
    items(item_id, bib_id, ...) — only items' bib_id participates (an
    existence probe, aggregated before a broadcast-friendly join).
    """
    parsed = orders.select(
        "bib_id", F.from_json("content", SIERRA_ORDER_SCHEMA).alias("o")
    )
    o = F.col("o")
    live = parsed.filter(
        ~F.coalesce(o.getField("deleted"), F.lit(False))
        & ~F.coalesce(o.getField("suppressed"), F.lit(False))
    ).select(
        "bib_id",
        o.getField("id").alias("order_sid"),
        order_item_label(o).alias("label"),
    )
    per_bib = (
        live.filter(F.col("label").isNotNull())
        .groupBy("bib_id")
        .agg(
            F.array_distinct(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("order_sid", "label"))
                    ),
                    lambda s: s.getField("label"),
                )
            ).alias("order_items")
        )
    )
    bib = F.from_json(F.col("content"), SIERRA_BIB_SCHEMA)
    gated = bibs.select(
        F.col("id").alias("bib_id"),
        F.try_element_at(bib.getField("fixedFields"), F.lit("28"))
        .isNotNull()
        .alias("has_cat_date"),
    )
    if items is not None:
        with_items = items.select("bib_id").distinct().withColumn(
            "has_items", F.lit(True)
        )
        gated = gated.join(with_items, "bib_id", "left").withColumn(
            "has_items", F.coalesce(F.col("has_items"), F.lit(False))
        )
    else:
        gated = gated.withColumn("has_items", F.lit(False))
    empty = F.array().cast("array<string>")
    return (
        gated.join(per_bib, "bib_id", "left")
        .select(
            "bib_id",
            F.when(
                F.col("has_cat_date") | F.col("has_items"), empty
            )
            .otherwise(F.coalesce(F.col("order_items"), empty))
            .alias("order_items"),
        )
    )


# --------------------------------------------------------------- holdings

def _loc_name_map_expr() -> Column:
    pairs = []
    for k, v in sorted(LOCATION_NAMES.items()):
        pairs += [F.lit(k), F.lit(v)]
    return F.create_map(*pairs)


def holdings_physical_location(rec: Column) -> Column:
    """struct<type,label,shelfmark> from fixed field 40 + 949 $a
    (SierraHoldings.scala:158-198)."""
    code = F.trim(_ff_value(rec, "40"))
    name = F.try_element_at(_loc_name_map_expr(), code)
    loc_type = _location_type(name)
    label = F.when(loc_type == "ClosedStores", F.lit("Closed stores")).otherwise(
        name
    )
    shelfmark = F.try_element_at(
        F.array_distinct(
            F.transform(
                F.flatten(
                    F.transform(
                        _vfs_tag(rec.getField("varFields"), "949"),
                        lambda vf: _sub_vals(vf, "a"),
                    )
                ),
                lambda c: F.trim(c),
            )
        ),
        F.lit(1),
    )
    return F.when(
        code.isNotNull() & name.isNotNull() & loc_type.isNotNull(),
        F.struct(
            loc_type.alias("type"), label.alias("label"), shelfmark.alias("shelfmark")
        ),
    )


def sierra_holdings(holdings: DataFrame) -> DataFrame:
    """holdings(holdings_id, bib_id, content) → one row per Holdings object:
    (bib_id, kind digital|physical, note, enumeration array<string>,
    loc_type, loc_label, shelfmark, url, link_text, relationship).

    Plan: one from_json + the enumeration UDF per record (narrow), then a
    single groupBy (bib_id, url) for the digital URL-compatibility merge;
    physical rows pass through untouched.  distinct() at the end mirrors
    the reference's final dedup.
    """
    from ..functions.holdings import holdings_enumeration_udf

    parsed = holdings.select(
        "bib_id", F.from_json("content", SIERRA_HOLDINGS_SCHEMA).alias("h")
    )
    h = F.col("h")
    live = parsed.filter(
        ~F.coalesce(h.getField("deleted"), F.lit(False))
        & ~F.coalesce(h.getField("suppressed"), F.lit(False))
    )
    enum_udf = holdings_enumeration_udf()
    live = live.withColumn(
        "enum", enum_udf(F.to_json(h.getField("varFields")))
    ).withColumn("is_digital", F.trim(F.coalesce(_ff_value(h, "40"), F.lit(""))) == "elro")

    # ---- physical
    vf866 = _vfs_tag(h.getField("varFields"), "866")
    description = F.array_join(
        F.flatten(F.transform(vf866, lambda vf: _sub_vals(vf, "a"))), " "
    )
    note = F.array_join(
        F.flatten(F.transform(vf866, lambda vf: _sub_vals(vf, "z"))), " "
    )
    enumeration = F.when(
        description != "", F.concat(F.array(description), F.col("enum"))
    ).otherwise(F.col("enum"))
    loc = holdings_physical_location(h)
    physical = (
        live.filter(~F.col("is_digital"))
        .select(
            "bib_id",
            F.lit("physical").alias("kind"),
            F.when(note != "", note).alias("note"),
            enumeration.alias("enumeration"),
            loc.getField("type").alias("loc_type"),
            loc.getField("label").alias("loc_label"),
            loc.getField("shelfmark").alias("shelfmark"),
            F.lit(None).cast("string").alias("url"),
            F.lit(None).cast("string").alias("link_text"),
            F.lit(None).cast("string").alias("relationship"),
        )
        .filter(F.col("note").isNotNull() | (F.size("enumeration") > 0))
        .distinct()
    )

    # ---- digital: explode 856 items of each elro record, sorted by
    # check-digit id; Holdings(note = item title, location = digital)
    digital_rows = (
        live.filter(F.col("is_digital"))
        .select(
            "bib_id",
            F.concat(
                h.getField("id"), sierra_check_digit(h.getField("id"))
            ).alias("sort_id"),
            "enum",
            F.explode(
                electronic_resources_expr(h.getField("varFields"))
            ).alias("it"),
        )
        .select(
            "bib_id",
            "sort_id",
            "enum",
            F.col("it").getField("url").alias("url"),
            F.col("it").getField("title").alias("note"),
            F.col("it").getField("link_text").alias("link_text"),
            F.col("it").getField("relationship").alias("relationship"),
        )
    )
    # per-URL compatibility merge (SierraHoldings.scala:209-282): combine
    # when notes and linkTexts are each unique-or-absent and the
    # enumerations collapse to a single distinct value
    g = digital_rows.groupBy("bib_id", "url").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "sort_id", "note", "link_text", "relationship", "enum"
                )
            )
        ).alias("rows")
    )
    rows = F.col("rows")
    notes = F.array_distinct(
        F.filter(
            F.transform(rows, lambda r: r.getField("note")),
            lambda x: x.isNotNull(),
        )
    )
    links = F.array_distinct(
        F.filter(
            F.transform(rows, lambda r: r.getField("link_text")),
            lambda x: x.isNotNull(),
        )
    )
    enums = F.array_distinct(F.transform(rows, lambda r: r.getField("enum")))
    compatible = (
        (F.size(notes) <= 1) & (F.size(links) <= 1) & (F.size(enums) == 1)
    )
    merged = F.when(
        compatible,
        F.array(
            F.struct(
                F.lit(None).cast("string").alias("sort_id"),
                F.try_element_at(notes, F.lit(1)).alias("note"),
                F.try_element_at(links, F.lit(1)).alias("link_text"),
                F.lit("Resource").alias("relationship"),
                F.try_element_at(enums, F.lit(1)).alias("enum"),
            )
        ),
    ).otherwise(rows)
    digital = (
        g.select("bib_id", "url", F.explode(merged).alias("r"))
        .select(
            "bib_id",
            F.lit("digital").alias("kind"),
            F.col("r").getField("note").alias("note"),
            F.col("r").getField("enum").alias("enumeration"),
            F.lit(None).cast("string").alias("loc_type"),
            F.lit(None).cast("string").alias("loc_label"),
            F.lit(None).cast("string").alias("shelfmark"),
            "url",
            F.col("r").getField("link_text").alias("link_text"),
            F.col("r").getField("relationship").alias("relationship"),
        )
        .distinct()
    )
    return digital.unionByName(physical)


# ----------------------------------------------------------- full bundle

def sierra_work_bundle(
    bibs: DataFrame,
    items: DataFrame | None = None,
    orders: DataFrame | None = None,
    holdings: DataFrame | None = None,
) -> DataFrame:
    """The COMPLETE Sierra work assembly — what SierraTransformer.scala
    produces once every record type is attached: the bib-field work row
    (plans/sierra_transform.transform_sierra) plus, when the companion
    record tables are supplied,

      * ``collection_path`` / ``eresources`` from the bib itself (this
        module),
      * ``items`` — the per-bib item rollup with bib-resolved shelfmarks
        and access conditions,
      * ``order_items`` — on-order messages (empty when items exist or
        the bib has a CAT DATE),
      * ``holdings`` — physical + digital holdings rollup.

    All companion joins key on the bib id (one shuffle each, rollups
    pre-aggregated map-side); the bundle is a left join so bibs without
    companion records keep empty collections.
    """
    from .sierra_transform import items_per_bib, transform_sierra

    works = transform_sierra(bibs)
    bib = F.from_json(F.col("content"), SIERRA_BIB_SCHEMA)
    extras = bibs.select(
        F.col("id").alias("sierra_id"),
        collection_path_expr(bib).alias("collection_path"),
        F.transform(
            electronic_resources_expr(bib.getField("varFields")),
            lambda r: F.concat_ws(
                "|",
                r.getField("url"),
                F.coalesce(r.getField("title"), F.lit("")),
                F.coalesce(r.getField("link_text"), F.lit("")),
                r.getField("relationship"),
            ),
        ).alias("eresources"),
    )
    out = works.join(extras, "sierra_id", "left")
    empty = F.array().cast("array<string>")
    if items is not None:
        rollup = items_per_bib(items, bibs).withColumnRenamed("bib_id", "sierra_id")
        out = out.join(rollup, "sierra_id", "left").withColumn(
            "items", F.coalesce("items", empty)
        )
    if orders is not None:
        oo = items_on_order(bibs, orders, items).withColumnRenamed(
            "bib_id", "sierra_id"
        )
        out = out.join(oo, "sierra_id", "left").withColumn(
            "order_items", F.coalesce("order_items", empty)
        )
    if holdings is not None:
        h = sierra_holdings(holdings)
        hr = h.groupBy(F.col("bib_id").alias("sierra_id")).agg(
            F.array_sort(
                F.collect_list(
                    F.concat_ws(
                        "|",
                        F.col("kind"),
                        F.coalesce("note", F.lit("")),
                        F.concat_ws("~", "enumeration"),
                        F.coalesce("loc_type", F.lit("")),
                        F.coalesce("loc_label", F.lit("")),
                        F.coalesce("shelfmark", F.lit("")),
                        F.coalesce("url", F.lit("")),
                        F.coalesce("link_text", F.lit("")),
                    )
                )
            ).alias("holdings")
        )
        out = out.join(hr, "sierra_id", "left").withColumn(
            "holdings", F.coalesce("holdings", empty)
        )
    return out
