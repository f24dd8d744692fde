"""Sierra item access conditions: RulesForRequesting + SierraItemAccess.

The round-3 verdict's ask #4: the merger's ItemsRule folds real item
payloads, so items need their access conditions.  Reference (all under
common/source_model/src/main/scala/weco/catalogue/source_model/sierra/):

* rules/SierraRulesForRequesting.scala:42-466 — the Sierra "Rules for
  Requesting" translated 1:1: an ordered rule chain over item fixed fields
  (88 status, 87 loan rule, 108 opacmsg, 79 itype location code, 61) that
  yields Requestable or a typed NotRequestable(message).
* rules/SierraItemAccess.scala:29-420 — the access-condition synthesis:
  (holdCount, status, opacmsg, rules-result, location type) pattern-matched
  in order into an AccessCondition(method, status, note), then the item
  display note folded in (an access-looking note moves onto the access
  condition; otherwise it stays on the item).
* source/Status.scala / OpacMsg.scala — the fixed-field vocabularies.

Everything is a Column when-chain in the reference's exact rule order —
whole-stage-codegen, no UDFs, no shuffles.  The item's ``displayNote``
follows the sierra-client convention (first fieldTag-"n" varField).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Status.scala / OpacMsg.scala vocabularies
ST_AVAILABLE, ST_PERM, ST_MISSING, ST_UNAVAIL = "-", "y", "m", "r"
ST_CLOSED, ST_SAFEGUARDED, ST_HOLDSHELF, ST_WITHDRAWN = "h", "g", "!", "x"
OM_ONLINE, OM_MANUAL, OM_OPEN, OM_APPT = "f", "n", "o", "a"
OM_DIGI, OM_DONOR, OM_UNAVAIL, OM_RESTRICTED, OM_APPROVAL = "b", "q", "u", "c", "p"

_IN_USE = "Item is in use by another reader. Please ask at Library Enquiry Desk."
_MANUAL_PLACEHOLDER = (
    "This item needs to be ordered manually. Please ask a member of staff, "
    'or email <a href="mailto:library@wellcomecollection.org">'
    "library@wellcomecollection.org</a>."
)
_FALLBACK_NOTE = (
    "This item cannot be requested online. Please contact "
    '<a href="mailto:library@wellcomecollection.org">'
    "library@wellcomecollection.org</a> for more information."
)
_MFAC = (
    "Item cannot be requested online. Please contact Medical Film & Audio "
    "Library.   Email: mfac@wellcome.ac.uk. Telephone: +44 (0)20 76118596/97."
)
_INFOSERV = (
    "Item cannot be requested online. Please ask at Information Service desk, "
    "email: infoserv@wellcome.ac.uk or telephone +44 (0)20 7611 8722."
)
_DPA = (
    "Item not available due to provisions of Data Protection Act. Return to "
    "Archives catalogue to see when this file will be opened."
)
_OPEN_SHELVES_MSG = (
    "Item is on open shelves.  Check Location and Shelfmark for location details."
)

_MANUAL_79 = [
    "dbiaa", "dcoaa", "dinad", "dinop", "dinsd", "dints", "dpoaa", "dimgs",
    "dhuaa", "dingo", "dpleg", "dpuih", "enhal", "gblip", "ofvds",
]
_OPEN_SHELVES_79 = [
    "isope", "isref", "gblip", "wghib", "wghig", "wghip", "wghir", "wghxb",
    "wghxg", "wghxp", "wghxr", "wgmem", "wgmxm", "wgpvm", "wgsee", "wgsem",
    "wgser", "wqrfc", "wqrfd", "wqrfe", "wqrfp", "wqrfr", "wslob", "wslom",
    "wslor", "wslox", "wsref", "hgslr", "wsrex",
]
_MANUAL_61_79 = ["ofvn1", "scmwc", "sgmoh", "somet", "somge", "sompr", "somsy"]
_DPA_79 = [
    "sc#ac", "sc#ra", "sc#wa", "sc#wf", "swm#m", "swm#o", "swm#1", "swm#2",
    "swm#3", "swm#4", "swm#5", "swm#6", "swm#7",
]
_TEMP_79 = ["temp1", "temp2", "temp3", "temp4", "temp5", "temp6"]

_RR_T = "struct<kind:string,message:string>"


def _ff(item: Column, code: str) -> Column:
    """fixedField(code): trimmed value, NULL when absent."""
    f = F.try_element_at(item.getField("fixedFields"), F.lit(code))
    return F.trim(f.getField("value"))


def _ff_display(item: Column, code: str) -> Column:
    f = F.try_element_at(item.getField("fixedFields"), F.lit(code))
    return f.getField("display")


def display_note(item: Column) -> Column:
    """The sierra-client displayNote: first fieldTag-'n' varField content
    (subfield $a contents joined when content is absent)."""
    vfs = F.filter(
        F.coalesce(
            item.getField("varFields"),
            F.array().cast(
                "array<struct<fieldTag:string,marcTag:string,ind1:string,"
                "ind2:string,content:string,"
                "subfields:array<struct<tag:string,content:string>>>>"
            ),
        ),
        lambda vf: vf.getField("fieldTag") == "n",
    )
    first = F.try_element_at(vfs, F.lit(1))
    joined = F.array_join(
        F.transform(
            F.filter(
                F.coalesce(
                    first.getField("subfields"),
                    F.array().cast("array<struct<tag:string,content:string>>"),
                ),
                lambda s: s.getField("tag") == "a",
            ),
            lambda s: s.getField("content"),
        ),
        " ",
    )
    return F.when(
        F.size(vfs) > 0,
        F.coalesce(first.getField("content"), F.nullif(joined, F.lit(""))),
    )


def rules_for_requesting(item: Column) -> Column:
    """SierraRulesForRequesting as a struct(kind, message) when-chain in the
    reference's exact rule order; kind 'Requestable' means no rule fired."""
    f88 = _ff(item, "88")
    f87 = _ff(item, "87")
    f108 = _ff(item, "108")
    f79 = _ff(item, "79")
    f61 = _ff(item, "61")

    def rr(kind, message):
        m = message if isinstance(message, Column) else F.lit(message)
        return F.struct(F.lit(kind).alias("kind"), m.alias("message"))

    return (
        F.when(f88 == "m", rr("ItemMissing", "This item is missing."))
        .when(f88 == "s", rr("ItemOnSearch", "This item is on search."))
        .when(f88 == "x", rr("ItemWithdrawn", "This item is withdrawn."))
        .when(f88 == "r", rr("ItemUnavailable", "This item is unavailable."))
        .when(f88 == "z", rr("NoPublicMessage", "fixed field 88 = z"))
        .when(f88 == "v", rr("AtConservation", "This item is with conservation."))
        .when(f88 == "h", rr("ItemClosed", "This item is closed."))
        .when(f88 == "g", rr("SafeguardedItem", "Safeguarded item."))
        .when(f88 == "j", rr("ItemUnavailable", "This item is unavailable."))
        .when(f88.isin("b", "c"), rr("RequestTopItem", "Please request top item."))
        .when(f88 == "d", rr("OnNewBooksDisplay", "On new books display."))
        .when(
            f88 == "e",
            rr("OnExhibition", "On exhibition. Please ask at Enquiry Desk."),
        )
        .when(f88 == "y", rr("NoPublicMessage", "fixed field 88 = y"))
        .when(
            (F.coalesce(f87, F.lit("0")) != "0") | (f88 == "!"),
            rr(
                "InUseByAnotherReader",
                "Item is in use by another reader. Please ask at Enquiry Desk.",
            ),
        )
        .when(
            f108.isin("n", "a", "p"),
            rr(
                "NeedsManualRequest",
                "This item cannot be requested online. Please place a manual request.",
            ),
        )
        .when(f108 == "u", rr("ItemUnavailable", "This item is unavailable."))
        .when(f108 == "b", rr("AtDigitisation", "At digitisation"))
        .when(
            f79.isin("mfgmc", "mfinc", "mfwcm", "hmfac", "mfulc"),
            rr("ContactUs", _MFAC),
        )
        .when(
            f79.isin(*_MANUAL_79),
            rr(
                "NeedsManualRequest",
                "This item cannot be requested online. Please place a manual request.",
            ),
        )
        .when(f79 == "harcl", rr("ItemUnavailable", "This item is unavailable."))
        .when(f79.isin("isvid", "iscdr"), rr("ContactUs", _INFOSERV))
        .when(f79.isin(*_OPEN_SHELVES_79), rr("OnOpenShelves", _OPEN_SHELVES_MSG))
        .when(
            f61 == "22",
            rr(
                "OnExhibition",
                "Item is on Exhibition Reserve. Please ask at the Enquiry Desk",
            ),
        )
        .when(
            f61.isin("17", "18", "15"),
            rr(
                "NoPublicMessage",
                F.concat(
                    F.lit("fixed field 61 = "),
                    f61,
                    F.lit(" ("),
                    F.coalesce(_ff_display(item, "61"), F.lit("<none>")),
                    F.lit(")"),
                ),
            ),
        )
        .when(
            (f61 == "14") | f79.isin(*_MANUAL_61_79),
            rr(
                "NeedsManualRequest",
                "This item cannot be requested online. Please place a manual request.",
            ),
        )
        .when(f79 == "sepep", rr("NoPublicMessage", "fixed field 79 = sepep"))
        .when(f79.isin(*_DPA_79), rr("ItemUnavailable", _DPA))
        .when(
            f79.isin(*_TEMP_79),
            rr("AtDigitisation", "At digitisation and temporarily unavailable."),
        )
        .when(
            f79.isin("rm001", "rmdda"),
            rr("NoPublicMessage", F.concat(F.lit("fixed field 79 = "), f79)),
        )
        .otherwise(rr("Requestable", F.lit(None).cast("string")))
    )


_AC_T = "struct<method:string,status:string,note:string,item_note:string>"


def item_access(item: Column, loc_type: Column) -> Column:
    """SierraItemAccess.createAccessCondition + the display-note fold →
    struct(method, status, note, item_note).  ``loc_type`` is the resolved
    physical location type string (ClosedStores / OpenShelves /
    OnExhibition / NULL)."""
    hold = item.getField("holdCount")
    status = _ff(item, "88")
    opac = _ff(item, "108")
    rr = rules_for_requesting(item)
    kind = rr.getField("kind")
    rmsg = rr.getField("message")
    dn = display_note(item)
    has_due = F.try_element_at(
        item.getField("fixedFields"), F.lit("65")
    ).isNotNull()
    closed = loc_type == "ClosedStores"
    open_sh = loc_type == "OpenShelves"

    lower = F.lower(F.coalesce(dn, F.lit("")))

    def contains_any(*subs):
        cond = F.lit(False)
        for s in subs:
            cond = cond | lower.contains(s)
        return cond

    is_manual_note = contains_any(
        "needs to be ordered", "to view this item", "to view it",
        "physical access", "physical copy", "why you need access",
        "details of your request", "to view please contact",
        "if you would like to see",
    )
    is_access_note = contains_any(
        "unavailable", "access", "please contact", "@wellcomecollection.org",
        "offsite", "shelved at",
    )

    def ac(method, st=None, note=None):
        n = note if isinstance(note, Column) else F.lit(note).cast("string")
        return F.struct(
            F.lit(method).alias("method"),
            F.lit(st).cast("string").alias("status"),
            n.alias("note"),
            F.lit(None).cast("string").alias("item_note"),
        )

    in_use = F.lit(_IN_USE)
    manual_note = F.when(dn.isNotNull() & is_manual_note, dn).otherwise(
        F.lit(_MANUAL_PLACEHOLDER)
    )
    marc999 = F.filter(
        F.coalesce(
            item.getField("varFields"),
            F.array().cast(
                "array<struct<fieldTag:string,marcTag:string,ind1:string,"
                "ind2:string,content:string,"
                "subfields:array<struct<tag:string,content:string>>>>"
            ),
        ),
        lambda vf: vf.getField("marcTag") == "999",
    )
    notes_999 = F.array_join(
        F.flatten(
            F.transform(
                marc999,
                lambda vf: F.transform(
                    F.filter(
                        F.coalesce(
                            vf.getField("subfields"),
                            F.array().cast("array<struct<tag:string,content:string>>"),
                        ),
                        lambda s: s.getField("tag") == "a",
                    ),
                    lambda s: s.getField("content"),
                ),
            )
        ),
        "<br />",
    )

    base = (
        # Online request, closed stores (SierraItemAccess.scala:78-91)
        F.when(
            (hold == 0) & (status == ST_AVAILABLE) & (opac == OM_ONLINE)
            & (kind == "Requestable") & closed,
            ac("OnlineRequest", "Open"),
        )
        # open shelves without a due date (:93-113)
        .when(
            (hold == 0) & (status == ST_AVAILABLE) & (opac == OM_OPEN)
            & (kind == "OnOpenShelves") & open_sh & ~has_due,
            ac("OpenShelves"),
        )
        # bound/contained in above (:115-122)
        .when(kind == "RequestTopItem", ac("NotRequestable", None, rmsg))
        # manual request (:124-151)
        .when(
            (hold == 0) & (status == ST_AVAILABLE) & (opac == OM_MANUAL)
            & (kind == "NeedsManualRequest") & closed,
            ac("ManualRequest", None, manual_note),
        )
        # closed (:153-172)
        .when(
            (status == ST_CLOSED) & (opac == OM_UNAVAIL) & (kind == "ItemClosed")
            & (loc_type.isNull() | closed),
            ac("NotRequestable", "Closed"),
        )
        # explicitly unavailable (:174-204)
        .when(
            (status == ST_UNAVAIL) & (opac == OM_UNAVAIL)
            & (kind == "ItemUnavailable"),
            ac(
                "NotRequestable", "TemporarilyUnavailable",
                "This item is undergoing internal assessment or conservation work.",
            ),
        )
        .when(
            (status == ST_UNAVAIL) & (opac == OM_DIGI)
            & (kind == "ItemUnavailable"),
            ac(
                "NotRequestable", "TemporarilyUnavailable",
                "This item is being digitised and is currently unavailable.",
            ),
        )
        # restricted but requestable (:206-220)
        .when(
            (hold == 0) & (status == ST_AVAILABLE) & (opac == OM_RESTRICTED)
            & (kind == "Requestable") & closed,
            ac("OnlineRequest", "Restricted"),
        )
        # by appointment beats permission required (:222-236)
        .when(
            (hold == 0) & (status == ST_PERM) & (opac == OM_APPT)
            & (kind == "NoPublicMessage") & closed,
            ac("ManualRequest", "ByAppointment"),
        )
        .when(
            (hold == 0) & (status == ST_PERM) & (opac == OM_DONOR)
            & (kind != "Requestable") & closed,
            ac("ManualRequest", "PermissionRequired"),
        )
        # missing / withdrawn override (:238-268)
        .when(
            (status == ST_MISSING) & (kind == "ItemMissing"),
            ac("NotRequestable", "Unavailable", rmsg),
        )
        .when(
            (status == ST_WITHDRAWN) & (kind == "ItemWithdrawn"),
            ac("NotRequestable", "Unavailable", rmsg),
        )
        .when(
            (status == ST_SAFEGUARDED) & (opac == OM_APPROVAL)
            & (kind == "SafeguardedItem"),
            ac("NotRequestable", "Safeguarded"),
        )
        # holds (:270-330)
        .when((hold > 0) & closed, ac("NotRequestable", "TemporarilyUnavailable", in_use))
        .when(
            (kind == "InUseByAnotherReader") & closed,
            ac("NotRequestable", "TemporarilyUnavailable", in_use),
        )
        .when(
            (kind == "InUseByAnotherReader") & open_sh,
            ac("OpenShelves", "TemporarilyUnavailable", in_use),
        )
        .when(open_sh & has_due, ac("OpenShelves", "TemporarilyUnavailable", in_use))
        # on exhibition with 999 shelfmark (:332-352)
        .when(
            (loc_type == "OnExhibition") & (F.size(marc999) > 0),
            ac("NotRequestable", None, notes_999),
        )
        .when(has_due, ac("NotRequestable", "TemporarilyUnavailable", in_use))
        # fallback (:354-372)
        .otherwise(ac("NotRequestable", None, F.lit(_FALLBACK_NOTE)))
    )

    # the display-note fold (SierraItemAccess.scala:44-64)
    ac_note = base.getField("note")
    note_eq = (ac_note.eqNullSafe(dn))
    folded_note = F.when(
        ac_note.isNull() & dn.isNotNull() & is_access_note & ~note_eq, dn
    ).otherwise(ac_note)
    item_note = (
        F.when(note_eq, F.lit(None).cast("string"))
        .when(dn.isNotNull() & is_access_note, F.lit(None).cast("string"))
        .otherwise(dn)
    )
    return F.struct(
        base.getField("method").alias("method"),
        base.getField("status").alias("status"),
        folded_note.alias("note"),
        item_note.alias("item_note"),
    )
