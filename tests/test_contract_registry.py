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
    prewrap_complex = set()
    for name, fn in entrymod.queries().items():
        # unwrap _serialize_wrap (its _fn default arg) to see the
        # PRE-wrap schema; serialize the same frame in-process so one
        # plan build covers both asserts
        defaults = getattr(fn, "__defaults__", None)
        base = defaults[0] if defaults else fn
        df = base(spark, sf_dir)
        if any(isinstance(f.dataType, (ArrayType, MapType, StructType))
               for f in df.schema.fields):
            prewrap_complex.add(name)
        wrapped = entrymod._contract_serialize(df)
        bad = [f.name for f in wrapped.schema.fields
               if isinstance(f.dataType, (ArrayType, MapType,
                                          StructType))]
        if bad:
            offenders[name] = bad
    assert offenders == {}
    # ADVICE r5 #3: _ORACLE_COMPLEX is a hand-maintained closed set; a
    # future query whose array output gets auto-flattened Spark-side
    # while its DuckDB twin stays unwrapped would surface only as a
    # silent value-hash mismatch. Pin the exact equality: queries with
    # complex top-level columns BEFORE the wrap == the twin-wrap set.
    assert prewrap_complex == set(entrymod._ORACLE_COMPLEX), (
        f"missing twin wrap: "
        f"{sorted(prewrap_complex - set(entrymod._ORACLE_COMPLEX))}; "
        f"stale _ORACLE_COMPLEX entries: "
        f"{sorted(set(entrymod._ORACLE_COMPLEX) - prewrap_complex)}")
