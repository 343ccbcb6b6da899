"""Transcription pins for the input-validation folds
(operators/input_validation.py) vs direct re-implementations of
app/core/validation/{validators,registry,errors}.py."""

import re

from pyspark.sql import functions as F

from mivaa_pdf_extractor_spark.operators import input_validation as iv

SF = "/root/testdata/sf0.001/documents.parquet"

COMPILED = [re.compile(p, re.IGNORECASE | re.DOTALL)
            for p in iv.BLOCKED_PATTERNS]


def _doc_ids(spark):
    return [r.d for r in spark.read.parquet(SF).select(
        F.col("doc_id").cast("long").alias("d")).distinct().collect()]


def _texts(doc):
    out = []
    for i in range(3):
        h = doc * 13 + i * 7
        out.append((iv.PATHS[i],
                    iv.SECURITY_TEXTS[h % len(iv.SECURITY_TEXTS)]))
    return out


def ref_check_string_threats(text):
    """validators.py:304-327 verbatim."""
    violations = []
    for pattern in COMPILED:
        matches = pattern.findall(text)
        if matches:
            violations.append((pattern.pattern, len(matches),
                               tuple(matches[:5])))
    return violations


def ref_sanitize(text, aggressive):
    """validators.py:375-403 verbatim (the per-pattern re-escape)."""
    sanitized = text
    for pattern in COMPILED:
        if aggressive:
            sanitized = pattern.sub("", sanitized)
        else:
            sanitized = sanitized.replace("<", "&lt;")
            sanitized = sanitized.replace(">", "&gt;")
            sanitized = sanitized.replace("\"", "&quot;")
            sanitized = sanitized.replace("'", "&#x27;")
            sanitized = sanitized.replace("&", "&amp;")
    return sanitized


def test_scan_matches_reference(spark):
    got = {}
    for r in iv.scan_string_threats(iv.synth_security_strings(
            spark.read.parquet(SF))).collect():
        got.setdefault((r.req_id, r.path), []).append(
            (r.pattern, r.match_count, tuple(r.matches)))
    want = {}
    for doc in _doc_ids(spark):
        for path, text in _texts(doc):
            v = ref_check_string_threats(text)
            if v:
                want[(doc, path)] = v
    assert got == want
    # the [:5] cap is exercised
    assert any(mc > 5 and len(ms) == 5
               for vs in got.values() for (_, mc, ms) in vs)


def test_sanitize_matches_reference(spark):
    got = {(r.req_id, r.path): (r.sanitized_escaped,
                                r.sanitized_aggressive)
           for r in iv.sanitize_strings(iv.synth_security_strings(
               spark.read.parquet(SF))).collect()}
    for doc in _doc_ids(spark):
        for path, text in _texts(doc):
            assert got[(doc, path)] == (
                ref_sanitize(text, False), ref_sanitize(text, True))
    # escape-cascade pin: an original '&' gains one 'amp;' per pattern
    amp = ref_sanitize("&", False)
    assert amp == "&" + "amp;" * len(iv.BLOCKED_PATTERNS)


class RefRegistry:
    """registry.py:173-402 transcription (the lookup-relevant parts):
    exact dict slots, _method_registrations incl. the
    every-reg-into-'*' append, registration-order scan."""

    def __init__(self):
        self.exact = {}
        self.by_method = {}

    @staticmethod
    def _compiled(pattern, is_regex):
        if is_regex:
            return re.compile(pattern)
        escaped = re.escape(pattern).replace(r"\*", "[^/]*")
        return re.compile(f"^{escaped}$")

    def register(self, pattern, method, is_regex, priority, enabled):
        rec = {"pattern": pattern, "method": method.upper(),
               "is_regex": is_regex, "priority": priority,
               "enabled": enabled,
               "rx": self._compiled(pattern, is_regex)}
        if not is_regex and "*" not in pattern:
            self.exact[f"{rec['method']}:{pattern}"] = rec
        self.by_method.setdefault(rec["method"], []).append(rec)
        if rec["method"] != "*":
            self.by_method.setdefault("*", []).append(rec)
        return rec

    def lookup(self, endpoint, method):
        mu = method.upper()
        hit = self.exact.get(f"{mu}:{endpoint}")
        if hit and hit["enabled"]:
            return hit, "exact"
        hit = self.exact.get(f"*:{endpoint}")
        if hit and hit["enabled"]:
            return hit, "wildcard_exact"
        candidates = list(self.by_method.get(mu, []))
        if mu != "*":
            candidates.extend(self.by_method.get("*", []))
        for rec in candidates:
            if not rec["enabled"]:
                continue
            if rec["method"] != "*" and rec["method"] != mu:
                continue
            if rec["rx"].match(endpoint):
                return rec, "pattern"
        return None, "none"


def test_registry_lookup_matches_reference(spark):
    reg = RefRegistry()
    recs = []
    for (_, pattern, method, is_regex, prio,
         enabled) in iv.REGISTRATIONS:
        recs.append(reg.register(pattern, method, is_regex, prio,
                                 enabled))
    seq_of = {id(r): s for s, r in enumerate(recs)}
    got = {(r.req_id): (r.matched_reg, r.match_tier)
           for r in iv.registry_lookup(
               iv.synth_registrations(spark),
               iv.synth_registry_requests(
                   spark.read.parquet(SF))).collect()}
    tiers_seen = set()
    for doc in _doc_ids(spark):
        ep, m = iv.REQUEST_CASES[doc % len(iv.REQUEST_CASES)]
        rec, tier = reg.lookup(ep, m)
        want = (seq_of[id(rec)] if rec else -1, tier)
        assert got[doc] == want, (doc, ep, m, got[doc], want)
        tiers_seen.add(tier)
    assert tiers_seen == {"exact", "wildcard_exact", "pattern", "none"}
    # the ignored-priority pin: '/api/xyz' PUT matches seq 6 (prio 0,
    # registered earlier) not seq 9 (prio 100)
    rec, _ = reg.lookup("/api/xyz", "PUT")
    assert seq_of[id(rec)] == 6
    # regex start-anchor-only pin
    rec, _ = reg.lookup("/api/v2/items/extra", "GET")
    assert seq_of[id(rec)] == 4


def ref_structure(doc):
    """validators.py:444-533 over the flattened synthetic tree."""
    paths = ["root", "a.b", "a.items[2]", "c[0].d", "e", "f.g"]
    n = doc % 3 + 4
    violations = []
    maxd = 0
    arr = []
    for i in range(n):
        depth = (doc * 3 + i * 5) % 13
        maxd = max(maxd, depth)
        if (doc + i) % 3 == 0:
            ln = (doc * 37 + i * 211) % 1500
            if ln > 1000:
                arr.append(f"Array at '{paths[i]}' has length {ln}, "
                           f"exceeds limit of 1000")
    if maxd > 10:
        violations.append(f"JSON depth {maxd} exceeds limit of 10")
    violations.extend(arr)
    return maxd, violations


def test_structure_matches_reference(spark):
    got = {r.req_id: (r.max_depth, r.valid, r.violation_reason,
                      r.message)
           for r in iv.validate_structure(
               iv.synth_structure_nodes(spark.read.parquet(SF)),
               10, 1000).collect()}
    for doc in _doc_ids(spark):
        maxd, violations = ref_structure(doc)
        if violations:
            reason = "; ".join(violations)
            want = (maxd, False, reason,
                    f"JSON structure validation failed: {reason}")
        else:
            want = (maxd, True, None, None)
        assert got[doc] == want, doc


def ref_error(doc):
    """errors.py:385-540 handler ladder over the synth events."""
    kind = ["pydantic", "http", "generic", "typed"][doc % 4]
    status_in = [400, 403, 408, 413, 415, 422, 429, 418, 500][doc % 9]
    detail = "d" * 600 if doc % 5 == 0 \
        else f"Detail message {doc % 7}"
    if kind == "pydantic":
        fp = [["body.name"], ["a", "b"], []][doc % 3]
        fm = [["field required"], ["m1", "m2"], []][doc % 3]
        if len(fp) == 1:
            msg = f"Validation failed for field '{fp[0]}': {fm[0]}"
        else:
            msg = f"Validation failed for {len(fp)} fields"
        etype, sev, status = "schema_validation", "medium", 422
    elif kind == "http":
        etype = iv.HTTP_STATUS_TO_TYPE.get(status_in, "internal_error")
        msg, sev, status = detail, "medium", status_in
    elif kind == "generic":
        msg = f"Internal validation error: boom {doc % 5}"
        etype, sev, status = "internal_error", "critical", 500
    else:
        etype = list(iv.ERROR_TAXONOMY)[doc % len(iv.ERROR_TAXONOMY)]
        sev, status = iv.ERROR_TAXONOMY[etype]
        msg = detail
    if len(msg) > 500:
        msg = msg[:497] + "..."
    return (kind, etype, f"VALIDATION_{etype.upper()}", sev, status,
            msg)


def test_error_responses_match_reference(spark):
    got = {r.event_id: (r.kind, r.error_type, r.error_code,
                        r.severity, r.status_code, r.message)
           for r in iv.error_responses(iv.synth_error_events(
               spark.read.parquet(SF))).collect()}
    saw_trunc = False
    for doc in _doc_ids(spark):
        want = ref_error(doc)
        assert got[doc] == want, doc
        if want[5].endswith("..."):
            saw_trunc = True
    assert saw_trunc
