"""Contract-registry hygiene: no silent query-key shadowing.

``queries()`` and ``oracle_sql()`` build plain dicts, so a key
registered twice silently drops the first implementation's contract
coverage (this bit the stage-4 ``product_embedding_text`` builder,
shadowed by the enrich-props join form).  Parse the entry source and
assert every ``q["..."] =`` assignment and every oracle dict key is
unique.
"""

import re
from pathlib import Path

ENTRY = Path(__file__).resolve().parent.parent / "__spark_entry__.py"


def _dupes(names):
    seen, dup = set(), set()
    for n in names:
        if n in seen:
            dup.add(n)
        seen.add(n)
    return sorted(dup)


def test_no_duplicate_query_registrations():
    src = ENTRY.read_text()
    names = re.findall(r'^\s*q\["([^"]+)"\]\s*=', src, re.M)
    assert len(names) > 300
    assert _dupes(names) == []


def test_no_duplicate_oracle_keys():
    src = ENTRY.read_text()
    # oracle_sql() returns one dict literal; its keys are string
    # literals followed by a colon at statement level inside return {}
    m = re.search(r"def oracle_sql\(\).*", src, re.S)
    assert m
    keys = re.findall(r'^\s{8}"([^"]+)":', m.group(0), re.M)
    assert len(keys) > 300
    assert _dupes(keys) == []


def test_every_oracle_key_has_a_query():
    src = ENTRY.read_text()
    qnames = set(re.findall(r'^\s*q\["([^"]+)"\]\s*=', src, re.M))
    m = re.search(r"def oracle_sql\(\).*", src, re.S)
    okeys = set(re.findall(r'^\s{8}"([^"]+)":', m.group(0), re.M))
    assert okeys - qnames == set()


def test_no_top_level_complex_columns(spark):
    """Driver-canonicalizer safety: the driver sorts every output
    column with pandas ``sort_values`` before hashing, which throws
    ``unhashable type: 'list'`` on array/map columns (the only red
    rows in CORRECTNESS_r04 were stuck_job_diagnosis/_stats for
    exactly this reason).  The contract boundary now flattens complex
    columns (`_contract_serialize`); this asserts NO registered query
    leaks one — including any future registration."""
    import importlib.util

    from pyspark.sql.types import ArrayType, MapType, StructType

    spec = importlib.util.spec_from_file_location("entrymod", ENTRY)
    entrymod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entrymod)

    sf_dir = "/root/testdata/sf0.001"
    offenders = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        bad = [f.name for f in df.schema.fields
               if isinstance(f.dataType, (ArrayType, MapType,
                                          StructType))]
        if bad:
            offenders[name] = bad
    assert offenders == {}
