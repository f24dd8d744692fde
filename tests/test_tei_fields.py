"""TEI field-family scenarios mirroring TeiLanguagesTest / TeiNotesTest /
TeiPhysicalDescriptionTest / TeiSubjectsTest / TeiContributorsTest /
TeiProductionTest (pipeline/transformer/transformer_tei/src/test).  The
core is pure python (same substrate as the nested-works walk), so most
scenarios run without a Spark session; one test drives the Arrow UDF."""

from catalogue_pipeline_spark.plans.tei_fields import extract_tei_fields

NS = 'xmlns="http://www.tei-c.org/ns/1.0"'


def doc(body, wid="MS_1", msid="WMS_Arabic_1"):
    return f"""<TEI {NS} xml:id="{wid}">
      <teiHeader><fileDesc>
        <publicationStmt><idno type="msID">{msid}</idno></publicationStmt>
        <sourceDesc><msDesc xml:lang="en" xml:id="{wid}_desc">
          {body}
        </msDesc></sourceDesc>
      </fileDesc></teiHeader>
    </TEI>"""


def test_languages_main_other_and_notes():
    got = extract_tei_fields(doc(
        "<msContents>"
        '<textLang mainLang="ar" source="IANA">Arabic</textLang>'
        '<textLang mainLang="sa">Sanskrit</textLang>'
        "</msContents>"
    ))
    assert got["languages"] == ["ara~Arabic", "san~Sanskrit"]
    assert got["notes"] == []
    # mainLang + otherLangs on one node — read every id
    got2 = extract_tei_fields(doc(
        '<msContents><textLang mainLang="btk" otherLangs="ms">Batak</textLang>'
        "</msContents>"
    ))
    assert got2["languages"] == ["btk~Batak"]  # (ms, 'Batak') has no rule
    # id-less label → language note; unmappable id/label pair → note
    got3 = extract_tei_fields(doc(
        "<msContents><textLang>Some unusual dialect</textLang>"
        '<textLang mainLang="xx">Klingon</textLang></msContents>'
    ))
    assert got3["languages"] == []
    assert got3["notes"] == [
        "language-note~Some unusual dialect",
        "language-note~Klingon",
    ]
    # custom-label rows keep the TEI label over the MARC name
    got4 = extract_tei_fields(doc(
        '<msContents><textLang mainLang="bbc">Toba-Batak</textLang>'
        '<textLang mainLang="grc">Ancient Greek</textLang></msContents>'
    ))
    assert got4["languages"] == [
        "btk~Toba-Batak", "grc~Greek, Ancient (to 1453)",
    ]


def test_notes_colophon_incipit_locus_and_hand():
    got = extract_tei_fields(doc(
        "<msContents>"
        "<colophon><locus>F. 9v</locus> iti siddham</colophon>"
        "<incipit><locus>F. 1v</locus> om namah</incipit>"
        "<explicit><locus>F. 3r</locus> samapta</explicit>"
        "<locus>PP. 1-27.</locus>"
        "</msContents>"
        "<physDesc><handDesc>"
        "<handNote>Written in a neat hand.</handNote>"
        '<handNote scribe="Scribe_A">skipped — contributor</handNote>'
        '<handNote><persName role="scr">Someone</persName></handNote>'
        "</handDesc></physDesc>"
        "<history><provenance notBefore=\"1900\" notAfter=\"1950\">"
        "Bought at auction.</provenance>"
        "<acquisition when=\"1985\">Given to the library.</acquisition>"
        "</history>"
    ))
    assert got["notes"] == [
        "locus-note~PP. 1-27.",
        "colophon~F. 9v iti siddham",
        "begins-note~F. 1v: om namah",
        "ends-note~F. 3r: samapta",
        "hand-note~Written in a neat hand.",
        "ownership-note~(not before 1900, not after 1950): Bought at auction.",
        "acquisition-note~(1985): Given to the library.",
    ]
    # scribe persName embedded in wider text IS kept as a note
    got2 = extract_tei_fields(doc(
        "<physDesc><handDesc>"
        '<handNote>In neat handwriting by <persName role="scr">X</persName></handNote>'
        "</handDesc></physDesc>"
    ))
    assert got2["notes"] == ["hand-note~In neat handwriting by X"]


def test_physical_description():
    got = extract_tei_fields(doc(
        '<physDesc><objectDesc><supportDesc material="paper">'
        "<support>Paper, folded in 2. <watermark>saucisson</watermark>"
        '<measure type="chainline">Chain distance 43 mm.</measure></support>'
        '<extent>3 pages <dimensions unit="mm" type="leaf">'
        "<height>100</height><width>300</width></dimensions></extent>"
        "</supportDesc></objectDesc></physDesc>"
    ))
    assert got["physical_description"] == (
        "Paper, folded in 2.; Watermarks: saucisson; Material: paper; "
        "3 pages; leaf dimensions: width 300 mm, height 100 mm"
    )
    # simple text-only support/extent
    got2 = extract_tei_fields(doc(
        "<physDesc><objectDesc><supportDesc>"
        "<support>Parchment roll.</support><extent>1 roll</extent>"
        "</supportDesc></objectDesc></physDesc>"
    ))
    assert got2["physical_description"] == "Parchment roll.; 1 roll"
    # hebrew-style <dim> dimensions
    got3 = extract_tei_fields(doc(
        "<physDesc><objectDesc><supportDesc>"
        '<extent>49 leaves <dimensions unit="cm">'
        '<dim type="width">3213.5 cm</dim><dim type="length">49.5 cm</dim>'
        "</dimensions></extent></supportDesc></objectDesc></physDesc>"
    ))
    assert got3["physical_description"] == (
        "49 leaves; dimensions: width 3213.5 cm, length 49.5 cm"
    )


def test_subjects():
    body = doc("<msContents/>")
    body = body.replace(
        "</teiHeader>",
        '<profileDesc><textClass><keywords scheme="#LCSH"><list><item>'
        '<term ref="subject_sh85083116">Medicine, Arab</term></item><item>'
        "<term>Bodies.</term></item></list></keywords>"
        '<keywords scheme="#MESH"><list><item>'
        '<term key="subject_D000715">Anatomy</term>'
        "</item></list></keywords></textClass></profileDesc></teiHeader>",
    )
    got = extract_tei_fields(body)
    assert got["subjects"] == [
        "Medicine, Arab~lc-subjects~sh85083116",
        "Bodies.~label-derived~bodies",
        "Anatomy~nlm-mesh~D000715",
    ]


def test_authors_and_scribes_on_nested_works():
    got = extract_tei_fields(doc(
        "<msContents>"
        '<msItem xml:id="MS_1_item1">'
        '<author key="person_97166546">'
        '<persName xml:lang="en">Avicenna, d. 980-1037</persName>'
        '<persName xml:lang="ar" type="original">ابن سينا</persName>'
        "</author>"
        '<author key="person_84812936">Paul of Aegina</author>'
        "<author>No Key Person</author>"
        "</msItem>"
        "</msContents>"
        "<physDesc><handDesc>"
        '<handNote scope="minor" scribe="Scribe_A">'
        '<locus target="#MS_1_item1">a 2-62</locus>Southern form of ta.</handNote>'
        '<handNote scope="sole"><persName role="scr">Mahādeva Pāṇḍe</persName></handNote>'
        "</handDesc></physDesc>"
    ))
    # wrapper work gets the locus-less scribe
    assert got["contributors"] == [
        "Mahādeva Pāṇḍe~scribe~label-derived~mahadeva pande"
    ]
    item = {i["id"]: i for i in got["items"]}["MS_1_item1"]
    # multiple persName → the type=original one; bare author text + key;
    # key-less author → label-derived; then the locus-targeted scribe
    assert item["contributors"] == [
        "ابن سينا~author~viaf~person_97166546",
        "Paul of Aegina~author~viaf~person_84812936",
        "No Key Person~author~label-derived~no key person",
        "Southern form of ta.~scribe~label-derived~southern form of ta",
    ]


def test_fihrist_authors_use_fihrist_authority():
    body = f"""<TEI {NS} xml:id="MS_F">
      <teiHeader><fileDesc>
        <publicationStmt>
          <idno type="msID">WMS_Arabic_1</idno>
          <idno type="catalogue">Fihrist</idno>
        </publicationStmt>
        <sourceDesc><msDesc>
          <msContents><msItem xml:id="MS_F_1">
            <author key="person_123">Someone</author>
          </msItem></msContents>
        </msDesc></sourceDesc>
      </fileDesc></teiHeader>
    </TEI>"""
    got = extract_tei_fields(body)
    item = {i["id"]: i for i in got["items"]}["MS_F_1"]
    assert item["contributors"] == ["Someone~author~fihrist~person_123"]


def test_production_origin():
    got = extract_tei_fields(doc(
        "<history><origin>"
        "<origPlace><country>India</country>, <region>Gujarat</region></origPlace>"
        '<origDate calendar="Gregorian">ca.1732-63AD <note>from watermarks</note></origDate>'
        '<origDate calendar="Hijri">1145</origDate>'
        "</origin></history>"
    ))
    assert got["production"] == (
        "India, Gujarat, ca.1732-63AD~India, Gujarat~~ca.1732-63AD"
    )
    got2 = extract_tei_fields(doc(
        "<history><origin><origPlace><orgName>Some Monastery</orgName>"
        "</origPlace></origin></history>"
    ))
    assert got2["production"] == "~~Some Monastery~"


def test_mspart_fields_and_msitem_exclusions():
    got = extract_tei_fields(doc(
        '<msPart xml:id="MS_1_A">'
        "<msContents>"
        '<textLang mainLang="he">Hebrew</textLang>'
        '<msItem xml:id="MS_1_A_1"><locus>F. 2</locus></msItem>'
        "</msContents>"
        "<physDesc><objectDesc><supportDesc>"
        "<support>Vellum.</support></supportDesc></objectDesc>"
        "<handDesc><handNote>Cypriot hand.</handNote></handDesc></physDesc>"
        "<history><origin><origPlace><country>Cyprus</country></origPlace>"
        "</origin></history>"
        "</msPart>"
    ))
    part = {i["id"]: i for i in got["items"]}["MS_1_A"]
    assert part["languages"] == ["heb~Hebrew"]
    assert part["physical_description"] == "Vellum."
    assert part["production"] == "Cyprus~Cyprus~~"
    assert "hand-note~Cypriot hand." in part["notes"]
    item = {i["id"]: i for i in got["items"]}["MS_1_A_1"]
    assert item["notes"] == ["locus-note~F. 2"]
    assert item["physical_description"] is None and item["production"] is None


def test_udf_wiring(spark):
    from pyspark.sql import functions as F

    from catalogue_pipeline_spark.plans.tei_fields import tei_fields_udf

    df = spark.createDataFrame(
        [("r1", doc('<msContents><textLang mainLang="ar">Arabic</textLang>'
                    "</msContents>"))],
        "id string, content string",
    )
    out = df.select(tei_fields_udf()(F.col("content")).alias("f")).collect()[0]
    assert out["f"]["languages"] == ["ara~Arabic"]
