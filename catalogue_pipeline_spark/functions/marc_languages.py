"""MARC Code List for Languages lookups (name <-> code).

The reference parses the public Library of Congress languages.xml
(https://www.loc.gov/standards/codelists/languages.xml) into two maps
(common/internal_model/.../languages/MarcLanguageCodeList.scala:14-115):

* code -> authorized name (all codes, including obsolete ones);
* name -> code over EVERY <name> descendant (authorized + variant names),
  EXCLUDING languages whose code carries status="obsolete", first code
  winning on duplicate names (the reference warns and takes codes.head).

``marc_languages.json`` is generated from that same public XML (the copy
bundled at catalogue_graph/src/lookups/languages.xml) with exactly those
rules: 516 codes, 6,555 names.

Spark-first: each lookup is ONE string literal parsed by ``str_to_map``
(single py4j call, single codegen'd map) — no join, no Python at row time.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

from pyspark.sql import Column
from pyspark.sql import functions as F

_HERE = os.path.dirname(os.path.abspath(__file__))
_PAIR_SEP = "\x01"
_KV_SEP = "\x02"


@lru_cache(maxsize=1)
def _tables() -> dict[str, dict[str, str]]:
    with open(os.path.join(_HERE, "marc_languages.json")) as f:
        return json.load(f)


def _map_literal(d: dict[str, str]) -> Column:
    blob = _PAIR_SEP.join(f"{k}{_KV_SEP}{v}" for k, v in d.items())
    return F.str_to_map(F.lit(blob), F.lit(_PAIR_SEP), F.lit(_KV_SEP))


def name_to_code_map() -> Column:
    return _map_literal(_tables()["name_to_code"])


def code_to_name_map() -> Column:
    return _map_literal(_tables()["code_to_name"])


def language_from_code(code: Column) -> Column:
    """code -> label (MarcLanguageCodeList.fromCode), NULL when unknown."""
    return F.try_element_at(code_to_name_map(), code)


def code_from_name(name: Column) -> Column:
    """name -> code (MarcLanguageCodeList.fromName), NULL when unknown."""
    return F.try_element_at(name_to_code_map(), name)
