#!/usr/bin/env python3
"""Build-time oracle generation (driver-side tooling, not shipped code).

Freezes two kinds of artifacts:
  1. Python-runtime parity tables (str.lower map, sre IGNORECASE fold map,
     Python-\\s whitespace set) into src/main/resources/graft/ — loaded by the
     Scala kernels at runtime so text semantics match the reference exactly
     (reference: /root/reference/ocr_processor.py:273-293).
  2. Golden test vectors for the demarcation fold, produced by EXECUTING the
     reference's pure functions (ocr_processor.py:319-507) under python3 with
     heavy imports stubbed (fitz/pytesseract/PIL), per SURVEY.md §5.2.

Run: python3 tools/gen_goldens.py   (idempotent; outputs are committed)
"""
import json, os, re, sys, random, unicodedata

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = os.path.join(REPO, "src/main/resources/graft")
GOLD = os.path.join(REPO, "src/test/resources/golden")
os.makedirs(RES, exist_ok=True)
os.makedirs(GOLD, exist_ok=True)

# ---------------------------------------------------------------- parity tables
import _sre
try:
    from re._casefix import _EXTRA_CASES  # py3.11+: dict cp -> alternates
    _equivalences = [(k,) + v for k, v in _EXTRA_CASES.items()]
except ImportError:
    from sre_compile import _equivalences

MAXCP = 0x110000

def cps(s):
    return " ".join(f"{ord(c):x}" for c in s)

# 1a. str.lower() full map (unconditional in Python; per-codepoint exact)
with open(os.path.join(RES, "py_lower.tsv"), "w") as f:
    n = 0
    for cp in range(MAXCP):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        c = chr(cp)
        l = c.lower()
        if l != c:
            f.write(f"{cp:x}\t{cps(l)}\n")
            n += 1
print("py_lower entries:", n)

# 1b. sre IGNORECASE fold map: fold(cp) = classrep(unicode_tolower(cp))
classmap = {}
for cls in _equivalences:
    rep = min(cls)
    for m in cls:
        classmap[m] = rep

def fold(cp):
    lo = _sre.unicode_tolower(cp)
    return classmap.get(lo, lo)

with open(os.path.join(RES, "py_fold.tsv"), "w") as f:
    n = 0
    for cp in range(MAXCP):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        fc = fold(cp)
        if fc != cp:
            f.write(f"{cp:x}\t{fc:x}\n")
            n += 1
print("py_fold entries:", n)

# sanity: fold model must agree with actual re.IGNORECASE matching on all
# equivalence-class members and a random sample of cased pairs
sample = set()
for cls in _equivalences:
    sample.update(cls)
    sample.update(ord(chr(m).upper()[0]) for m in cls if len(chr(m).upper()) == 1)
rng = random.Random(42)
sample.update(rng.randrange(0x20, 0x2FA20) for _ in range(3000))
sample = [cp for cp in sample if not (0xD800 <= cp <= 0xDFFF) and cp < MAXCP]
checked = 0
for a in sample:
    for b in (a, _sre.unicode_tolower(a), fold(a)):
        want = fold(a) == fold(b)
        got = re.fullmatch(re.escape(chr(a)), chr(b), re.IGNORECASE) is not None
        assert want == got, (hex(a), hex(b), want, got)
        checked += 1
print("fold model verified on", checked, "pairs")

# 1b2. Final_Sigma context predicates. CPython str.lower() maps U+03A3 to
# final sigma via handle_capital_sigma (unicodeobject.c), scanning backward
# past Case_Ignorable chars for a Cased char and forward likewise. Probe both
# predicates behaviorally:
#   P1(c) = (chr(c)+'Σ').lower() ends 'ς'  ⇔ not ignorable(c) and cased(c)
#   P2(c) = ('A'+chr(c)+'Σ').lower() ends 'ς' ⇔ ignorable(c) or P1(c)
with open(os.path.join(RES, "py_sigma_ctx.tsv"), "w") as f:
    nc = ni = 0
    for cp in range(MAXCP):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        c = chr(cp)
        p1 = (c + "Σ").lower().endswith("ς")
        p2 = ("A" + c + "Σ").lower().endswith("ς")
        ign = p2 and not p1
        cased = p1
        if ign or cased:
            f.write(f"{cp:x}\t{'i' if ign else 'c'}\n")
            if ign: ni += 1
            else: nc += 1
print("sigma ctx: cased(non-ign)", nc, "ignorable", ni)
# sanity on the model vs python itself
for s in ["ΑΣ", "Σ", "αΣ", "ΑΣ.", "Α.Σ", "ΑΣβ", "ᾼΣ", "ΣΣ", "ΑΣͅ",
          "Σ ", " Σ", "Α'Σ", "ΑΣ'", "ΑΣ'β"]:
    pass  # covered by kernel vectors below

# 1c. Python \s whitespace set
ws = [cp for cp in range(0x10000) if re.match(r"\s", chr(cp))]
with open(os.path.join(RES, "py_whitespace.tsv"), "w") as f:
    for cp in ws:
        f.write(f"{cp:x}\n")
print("whitespace cps:", [hex(c) for c in ws])

# ---------------------------------------------------------------- reference import
class _Stub:
    def __getattr__(self, k):
        return _Stub()
    def __call__(self, *a, **k):
        return _Stub()

for mod in ("fitz", "pytesseract", "PIL", "PIL.Image"):
    sys.modules[mod] = _Stub()
sys.path.insert(0, "/root/reference")
import ocr_processor as ref  # noqa: E402  (pure functions only)

# ---------------------------------------------------------------- kernel vectors
TRICKY = [
    "", " ", "  ", "a", "Hello World", "hello\tworld\r\n", " nbsp thin",
    "fs", "zwsp​kept", "K kelvin K",
    "straße STRASSE", "İstanbul i̇stanbul istanbul",
    "Σσς sigma ΑΣ", "µmicroμmu",
    "ſlong s", "ı1 dotless", "MiXeD CaSe MiXeD", "aaa",
    "line1\nline2 line3 line4", "　ideographic　space",
    "\x85nel", "tab\ttab", "a|b|c", "ExactMatch: Foo", "exactmatch:bar",
    "  EXACTMATCH:  baz  ", "Exact Match: no", "ẞ big sharp s ß",
    # final-sigma context coverage
    "ΑΣ", "Σ", "αΣ", "ΑΣ.", "Α.Σ", "ΑΣβ", "ᾼΣ", "ΣΣ", "ΑΣͅ",
    "Σ ", " Σ", "Α'Σ", "ΑΣ'", "ΑΣ'β", "ΑΣ́", "ΆΣ", " Σ ΑΣ ΑΣΑ",
]
IDS = ["a", "l", "K", "K", "ss", "ß", "σ", "ς", "i",
       "İ", "ı", "MIXED", "world", "STRAßE", "ſ",
       "exactmatch:", "|", " ", "aa", "µ", "μ", "nel", "e"]

vec = {
    "normalize": [{"in": t, "out": ref.normalize_text(t)} for t in TRICKY],
    "lower": [{"in": t, "out": t.lower()} for t in TRICKY],
    "count": [{"page": p, "id": i, "n": ref.count_occurrences(p, i)}
              for p in TRICKY for i in IDS],
    "contains": [{"page": p, "id": i, "r": i.lower() in p.lower()}
                 for p in TRICKY for i in IDS],
    "is_exact": [{"in": t, "r": ref._is_exact_match(t)} for t in TRICKY],
    "clean_exact": [{"in": t, "out": ref._clean_exact_match_identifier(t)}
                    for t in TRICKY],
    "strip": [{"in": t, "out": t.strip()} for t in TRICKY],
}
with open(os.path.join(GOLD, "kernel_vectors.json"), "w") as f:
    json.dump(vec, f, ensure_ascii=False, indent=1)
print("kernel vectors:", {k: len(v) for k, v in vec.items()})

# ---------------------------------------------------------------- demarcation goldens
def rule(seq, **kw):
    r = {
        "DocumentTypeID": kw.get("dtid", f"DT{seq}"),
        "DocumentTypeName": f"Type {seq}",
        "StartingIdentifier": kw.get("start", ""),
        "StartingIdentifierPlus1": kw.get("plus1", ""),
        "EndingIdentifier": kw.get("end", ""),
        "EndingIdentifierMinus1": kw.get("minus1", ""),
        "NoOfPages": kw.get("npages", 0),
        "Occurence": kw.get("occ", 0),
        "StartingMinusN": kw.get("soff", " "),
        "EndingMinusN": kw.get("eoff", " "),
        "Sequence": str(seq),
        "CoverPage": "",
        # envelope enrichment (main.py:232-236)
        "DocReceivedId": kw.get("drid", 1000 + seq),
        "FirmFile": kw.get("firm", "FF-1"),
        "UploadDatasheetid": kw.get("uds", 77),
        "SessionId": kw.get("sess", None),
    }
    if kw.get("no_dtid"):
        # absent key: the reference's `identifier.get("DocumentTypeID")`
        # (ocr_processor.py:496) then emits None, not "" — the row must
        # carry null end to end (the XML layer is what maps None -> "")
        del r["DocumentTypeID"]
    return r

def pages_fixture():
    # analog of reference test/test2.py style fixture, own wording
    return [
        "Transcript Cover Sheet",                                   # 1
        "Begin Alpha Section\nalpha body text",                     # 2
        "alpha continues here",                                     # 3
        "more   alpha content",                                # 4
        "Close Alpha Section",                                      # 5
        "interlude page",                                           # 6
        "Begin Beta Report",                                        # 7
        "beta details",                                             # 8
        "beta details",                                             # 9
        "final page of transcript",                                 # 10
    ]

cases = []

def case(name, pages, rules):
    out = ref.demarcate_document(pages, [dict(r) for r in rules])
    cases.append({"name": name, "pages": pages, "rules": rules, "expected": out})

P = pages_fixture()
# basic start/end + no-end->doc-end + no-start->page1 fixed length (test2 analog)
case("basic_three", P, [
    rule(1, start="Begin Alpha Section", end="Close Alpha Section"),
    rule(2, start="Begin Beta Report"),
    rule(3, npages=1),
])
# order dependence: cover sheet rule last vs first
case("cover_first", P, [
    rule(1, npages=1),
    rule(2, start="Begin Alpha Section", end="Close Alpha Section"),
])
# overlap invalidation: second rule overlaps claimed range
case("overlap_invalidated", P, [
    rule(1, start="Begin Alpha Section", end="Close Alpha Section"),
    rule(2, start="alpha continues", end="interlude page"),
])
# pipe alternatives + occurrence threshold (cumulative across pages+alts)
case("pipe_occurrence", P, [
    rule(1, start="beta details|alpha continues", occ=2),
])
case("occurrence_three", ["x a", "a a", "a x a"], [
    rule(1, start="a", occ=4),
])
# plus1 primary with positive offset added; demarcation checked on target page
case("plus1_offset", P, [
    rule(1, npages=2),  # claims 1-2
    rule(2, plus1="Transcript Cover Sheet", soff="3", npages=2),
])
# plus1 overrides start
case("plus1_priority", P, [
    rule(1, start="Begin Beta Report", plus1="Begin Alpha Section", npages=1),
])
# minus1 end with offset subtracted, sanity fail -> -1 -> zeroed
case("minus1_sanity_fail", P, [
    rule(1, start="Begin Beta Report", minus1="beta details", eoff="5"),
])
# minus1 end ok
case("minus1_ok", P, [
    rule(1, start="Begin Alpha Section", minus1="interlude", eoff="1"),
])
# fixed pages clamped to total
case("npages_clamp", P, [
    rule(1, start="Begin Beta Report", npages=99),
])
# not found start
case("start_not_found", P, [
    rule(1, start="does not exist", end="whatever"),
])
# end not found -> zeroed
case("end_not_found", P, [
    rule(1, start="Begin Alpha Section", end="does not exist"),
])
# ExactMatch in start (whole normalized page equality) — synthetic coverage
case("exactmatch_start", P, [
    rule(1, start="ExactMatch: alpha continues here", npages=2),
])
case("exactmatch_no_hit_substring", P, [
    rule(1, start="ExactMatch: alpha continues", npages=2),
])
case("exactmatch_end", P, [
    rule(1, start="Begin Alpha Section", end="ExactMatch: Close Alpha Section"),
])
# exact match with messy whitespace (normalization on both sides)
case("exactmatch_ws", ["  alpha  continues\t\nhere ", "x"], [
    rule(1, start="exactMATCH:   alpha continues here", npages=1),
])
# sequence ordering: later sequence processed later regardless of list order
case("sequence_order", P, [
    rule(5, start="alpha continues", npages=3),
    rule(1, start="Begin Alpha Section", end="Close Alpha Section"),
])
# string sequence with gaps + stable tie
case("sequence_gaps", P, [
    rule(30, npages=1),
    rule(7, start="Begin Beta Report", npages=2),
])
# occurrence 0 coerced to 1
case("occ_zero", P, [rule(1, start="interlude", occ=0, npages=1)])
# negative occurrence -> immediate first page
case("occ_negative", P, [rule(1, start="zzz-nope", occ=-2, npages=1)])
# blank stringly offsets
case("blank_offsets", P, [
    rule(1, start="Begin Beta Report", end="final page", soff=" ", eoff=""),
])
# plus1 negative offset -> potential page <= 0 -> returned as-is -> zeroed
case("plus1_negative_offset", P, [
    rule(1, plus1="Begin Alpha Section", soff="-5", npages=1),
])
# plus1 offset beyond doc end: first_page>total, end-search branch
case("plus1_offset_past_end", P, [
    rule(1, plus1="final page", soff="3", end="anything"),
])
case("plus1_offset_past_end_npages", P, [
    rule(1, plus1="final page", soff="3", npages=2),
])
# demarcated-page skipping in start scan
case("skip_demarcated", P, [
    rule(1, start="beta details", npages=1),          # claims 8
    rule(2, start="beta details", npages=1),          # must skip 8, claim 9
    rule(3, start="beta details", npages=1),          # none left -> zeroed
])
# whole doc when no end ids and start found mid-doc
case("tail_to_end", P, [rule(1, start="interlude")])
# empty pipe segments dropped
case("pipe_empties", P, [rule(1, start="| |Begin Beta Report| ", npages=1)])
# case-insensitive matching incl special chars
case("ci_kelvin", ["temperature 300K here", "x"], [
    rule(1, start="300k", npages=1),
])
case("ci_sigma", ["ΣΙΓΜΑ header", "x"], [
    rule(1, start="σιγμα", npages=1),
])
# multi-rule realistic mix (shapes from the 10-sample corpus)
case("mix_corpus_shapes", P + ["appendix A", "appendix B"], [
    rule(1, npages=1),
    rule(2, start="Begin Alpha Section|Alpha Part", end="Close Alpha Section"),
    rule(3, plus1="Begin Beta Report", soff="1", minus1="final page", eoff="1"),
    rule(4, start="appendix", occ=2),
    rule(5, start="never present", end="also absent"),
])
# zero-length doc guard: empty id strings only
case("all_empty_ids_fixed", P, [rule(1, npages=3)])
case("no_ids_no_npages", P, [rule(1)])  # start=page1, no end ids -> doc end
# absent DocumentTypeID: the emitted row's DocumentTypeId is None (null),
# not "" — nullability fidelity at the SegmentRow level (r3 verdict #8)
case("missing_dtid", P, [
    rule(1, start="Begin Alpha Section", end="Close Alpha Section", no_dtid=True),
    rule(2, start="Begin Beta Report", npages=1),
])

# real rule-corpus shapes (SURVEY §5.1): the ACTUAL Sample2/Sample5
# Identifier payloads (13-rule doc, pipe alternatives, Occurence:2,
# stringly " " offsets, Plus1/Minus1 chains) run end-to-end against
# mechanically planted page sets; expected output comes from executing the
# reference, same as every other golden.
def enrich(r, i):
    r = dict(r)
    r.setdefault("DocReceivedId", 5000 + i)
    r.setdefault("FirmFile", "FF-S")
    r.setdefault("UploadDatasheetid", 88)
    r.setdefault("SessionId", None)
    return r

def first_alt(s):
    alts = [a.strip() for a in (s or "").split("|") if a.strip()]
    return alts[0] if alts else ""

def pages_for(rules):
    pages = ["transcript cover page"]
    for r in rules:
        occ = r.get("Occurence") or 0
        occ = occ if occ > 0 else 1
        start = first_alt(r.get("StartingIdentifierPlus1")) or first_alt(r.get("StartingIdentifier"))
        end = first_alt(r.get("EndingIdentifierMinus1")) or first_alt(r.get("EndingIdentifier"))
        for _ in range(occ):
            if start and not start.lower().startswith("exactmatch:"):
                pages.append(f"header line\n{start}\nbody text")
        pages.append("filler page between sections")
        if end and not end.lower().startswith("exactmatch:"):
            pages.append(f"closing words {end} trailing")
    pages.append("final transcript page")
    return pages

for n in (2, 5):
    with open(f"/root/reference/test/payload/Input_Sample{n}.json") as f:
        payload = json.load(f)
    srules = [enrich(r, i) for i, r in enumerate(payload["Identifiers"])]
    case(f"sample{n}_planted", pages_for(srules), srules)
    # adversarial layout: every start marker stacked on consecutive early
    # pages -> exercises overlap invalidation + demarcated-page skipping
    stacked = ["cover"] + [
        (first_alt(r.get("StartingIdentifier")) or
         first_alt(r.get("StartingIdentifierPlus1")) or "blank filler")
        for r in srules] + ["tail page"]
    case(f"sample{n}_stacked", stacked, srules)

# randomized property corpus: synthetic pages & rules, seeded
rng = random.Random(20260816)
WORDS = ["alpha", "beta", "gamma", "delta", "section", "report", "invoice",
         "cover", "final", "begin", "close", "end", "summary", "exhibit",
         "Über", "straße", "İzmir", "Kelvin"]
def rand_page():
    n = rng.randint(1, 12)
    parts = [rng.choice(WORDS) for _ in range(n)]
    seps = [rng.choice([" ", "  ", "\t", "\n", " ", " \r\n "]) for _ in parts]
    return "".join(s + w for w, s in zip(parts, seps))

for ci in range(25):
    npg = rng.randint(1, 15)
    pages = [rand_page() for _ in range(npg)]
    nr = rng.randint(1, 6)
    rules = []
    for si in range(nr):
        kw = {}
        pick = lambda: rng.choice(WORDS) if rng.random() < 0.8 else rand_page()[:20]
        shape = rng.random()
        if shape < 0.25:
            kw["start"] = "|".join(pick() for _ in range(rng.randint(1, 3)))
        elif shape < 0.45:
            kw["plus1"] = pick()
            kw["soff"] = rng.choice([" ", "", "0", "1", "2", "-1"])
        elif shape < 0.55:
            pass  # no start -> page 1
        else:
            kw["start"] = pick()
        if rng.random() < 0.4:
            kw["npages"] = rng.randint(0, 5)
        elif rng.random() < 0.5:
            kw["end"] = pick()
        elif rng.random() < 0.5:
            kw["minus1"] = pick()
            kw["eoff"] = rng.choice([" ", "0", "1", "3"])
        if rng.random() < 0.3:
            kw["occ"] = rng.choice([0, 1, 2, 3])
        if rng.random() < 0.2:
            kw["start"] = "ExactMatch: " + kw.get("start", pick())
        rules.append(rule(si + 1, **kw))
    case(f"random_{ci:02d}", pages, rules)

with open(os.path.join(GOLD, "demarcation_cases.json"), "w") as f:
    json.dump(cases, f, ensure_ascii=False, indent=1)
print("demarcation cases:", len(cases))

# ---------------------------------------------------------------- xml golden
# lxml is not installed in this sandbox; emulate etree.tostring(root,
# pretty_print=True, encoding='unicode') for the reference's fixed shape
# (data_models.py:7-32): 2-space indent, leaf text inline, empty text ->
# self-closing <K/>, text-escaped &<>, trailing newline.
def esc(s):
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

def emulate_lxml_xml(rows):
    out = ["<SubDocumentDetails>"]
    for row in rows:
        out.append("  <SubDocumentRow>")
        for k, v in row.items():
            t = str(v if v is not None else "")
            out.append(f"    <{k}/>" if t == "" else f"    <{k}>{esc(t)}</{k}>")
        out.append("  </SubDocumentRow>")
    out.append("</SubDocumentDetails>")
    return "\n".join(out) + "\n"

rows = ref.demarcate_document(P, [dict(rule(1, start="Begin Alpha Section",
                                            end="Close Alpha Section")),
                                  dict(rule(2, npages=1))])
xml = emulate_lxml_xml(rows)
with open(os.path.join(GOLD, "subdoc_xml.golden.xml"), "w") as f:
    f.write(xml)
with open(os.path.join(GOLD, "subdoc_xml_rows.json"), "w") as f:
    json.dump(rows, f, ensure_ascii=False, indent=1)
print("xml golden bytes:", len(xml))
print("ALL GOLDENS WRITTEN OK")
