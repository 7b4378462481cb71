"""Deterministic synthetic ``pages`` corpus with injected defect categories.

The analog of the reference's golden TestFiles taxonomy
(tests/README.md:138-190): each category is one synthetic crawl-day
partition with a known expected verdict and known expected violation
types, mirroring ``categorize_expected_result``
(tests/regression_genre_test.rs:209-255).

Determinism: every field of row ``idx`` of category ``cat`` derives from
a counter-based SplitMixRNG keyed (seed, category_id, idx, field) — so
generation is embarrassingly parallel and byte-identical regardless of
which Spark partition materializes which row (FIXTURES.md §6).

Defects are injected at the *content* level wherever possible (e.g.
TruncatedText generates genuinely tiny documents) so that the stored
``text`` stays byte-identical to ``extract_text(html)`` except in the two
categories whose whole point is to break that invariant (TextMismatch,
MalformedHtml).  This keeps the checks orthogonal: one category, one
firing check — the reference's one-defect-per-golden-file design.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from audio_quality_checker_spark.functions.extract import extract_text
from audio_quality_checker_spark.functions.hashing import SplitMixRNG

SEED = 42

# field sub-keys so each field has an independent RNG stream
_F_URL, _F_LANG, _F_BODY, _F_DEFECT = 1, 2, 3, 4

WORDS = (
    "the quick brown fox jumps over lazy dog pack my box with five dozen "
    "liquor jugs how vexingly daft zebras amber crystal delta ember forest "
    "garden harbor island jungle kernel ladder meadow needle orchard panel "
    "quarry ribbon saddle timber upland valley willow yonder zephyr anchor "
    "beacon candle dolphin engine falcon glacier hammer indigo jacket kettle "
    "lantern marble nectar opal pebble quiver raven silver trellis umbrella "
    "velvet walnut xylem yarn zinc archive bridge canyon drift ellipse fjord "
    "granite hollow inlet jetty knoll lagoon mantle nimbus outcrop plateau "
    "quartz ridge summit terrace uplift vertex wharf yardarm zenith basalt "
    "cobalt dune escarpment floe geyser headland isthmus moraine"
).split()

CJK_WORDS = list("数据质量检验引擎网页文档分析系统统计分布检查验证平台")

LANGS = ["en", "de", "fr", "es", "zh", None, "it", "nl", "pt", "ru"]
# base distribution per FIXTURES.md §1 ("other" split across it/nl/pt/ru)
_BASE_W = [0.55, 0.12, 0.10, 0.08, 0.07, 0.03, 0.0125, 0.0125, 0.0125, 0.0125]
# LangDrift: en 0.55->0.30, zh 0.07->0.30, rest renormalized-ish
_DRIFT_W = [0.30, 0.10, 0.08, 0.07, 0.30, 0.03, 0.03, 0.03, 0.03, 0.03]


def _cum(ws):
    out, acc = [], 0.0
    for w in ws:
        acc += w
        out.append(acc)
    out[-1] = 1.0
    return out


_BASE_CUM = _cum(_BASE_W)
_DRIFT_CUM = _cum(_DRIFT_W)

HOSTS = [f"host{i:03d}.example.org" for i in range(200)]
ROGUE_HOSTS = [f"rogue{i:02d}.unknown.test" for i in range(20)]

CRAWL_START = dt.datetime(2025, 11, 1, tzinfo=dt.timezone.utc)

# (name, should_pass, expected violation types) — FIXTURES.md §2
CATEGORIES: list[tuple[str, bool, tuple[str, ...]]] = [
    ("Control_Clean", True, ()),
    ("NullStorm", False, ("NullRateExceeded",)),
    ("TruncatedText", False, ("LengthDistributionAnomaly",)),
    ("PaddedText", False, ("LengthDistributionAnomaly",)),
    ("DupUrl", False, ("UniquenessViolation",)),
    ("UnknownHost", False, ("ReferentialViolation",)),
    ("LangDrift", False, ("DistributionDrift",)),
    ("LengthDrift", False, ("DistributionDrift",)),
    ("TextMismatch", False, ("ExtractionMismatch",)),
    ("MalformedHtml", False, ("ExtractionError",)),
    ("Combined_Dup_Drift", False, ("UniquenessViolation", "DistributionDrift")),
    ("SkewHost", True, ()),
    # declared-domain nonconformance: non-ISO-639-1 lang labels + warc_ts
    # outside the declared crawl range (the claimed/actual schema check)
    ("SchemaDrift", False, ("SchemaViolation",)),
    # corroboration semantics (detector.rs:341-358 / upsampling.rs:351-398):
    # a ~3% dup rate lands in the weakest confidence tier (0.65).  Alongside
    # lang drift the weak signal is corroborated and reported; alone it is
    # suppressed and the day PASSES (prefer false negatives on lone
    # borderline signals).  Rates calibrated against the fixed seed so the
    # realized dup count stays in (1x, 2x) of max_dup_rate at every fixture
    # row count in use (170/200/400).
    ("WeakDup_Drift", False, ("UniquenessViolation", "DistributionDrift")),
    ("WeakDup", True, ()),
]
CATEGORY_NAMES = [c[0] for c in CATEGORIES]
_CAT_ID = {name: i for i, (name, _, _) in enumerate(CATEGORIES)}


def partition_day(category: str) -> str:
    """Crawl-day partition key for a category (one category per day)."""
    d = CRAWL_START + dt.timedelta(days=_CAT_ID[category])
    return d.strftime("%Y-%m-%d")


def _make_url(cat_id: int, idx: int, seed: int,
              hot_frac: float | None = None) -> str:
    rng = SplitMixRNG(seed, cat_id, idx, _F_URL)
    cat = CATEGORIES[cat_id][0]
    if cat == "UnknownHost" and rng.uniform() < 0.05:
        host = rng.choice(ROGUE_HOSTS)
    elif cat == "SkewHost" and rng.uniform() < 0.40:
        host = HOSTS[0]
    elif hot_frac and rng.uniform() < hot_frac:
        # pathological-host corpus (SURVEY §7 known-hard #5): ONE host
        # owns `hot_frac` of EVERY category — the global skew the salted
        # operators exist for.  Off (None) by default: the golden corpus
        # and all verdict fixtures are unchanged.
        host = HOSTS[0]
    else:
        host = rng.choice(HOSTS)
    p1, p2 = rng.choice(WORDS), rng.choice(WORDS)
    return f"https://{host}/{p1}/{p2}/{cat_id:02d}{idx:08d}.html"


def _make_body(cat: str, rng: SplitMixRNG, lang) -> tuple[str, list[str]]:
    """(title, paragraphs) for the html payload."""
    words = CJK_WORDS if lang == "zh" else WORDS
    joiner = "" if lang == "zh" else " "
    if cat == "LengthDrift":
        n_paras, wlo, whi = rng.randint(2, 7), 15, 41
    elif cat == "TruncatedText" and rng.uniform() < 0.30:
        n_paras, wlo, whi = 1, 4, 9  # genuinely tiny document
    else:
        n_paras, wlo, whi = rng.randint(4, 13), 30, 81
    title = joiner.join(rng.choice(words) for _ in range(rng.randint(3, 9)))
    paras = []
    for _ in range(n_paras):
        p = joiner.join(rng.choice(words) for _ in range(rng.randint(wlo, whi)))
        if rng.uniform() < 0.10:
            p += " Q&amp;A &lt;beta&gt;"  # exercise entity unescaping
        paras.append(p)
    if cat == "PaddedText" and rng.uniform() < 0.30:
        filler = joiner.join(rng.choice(words) for _ in range(100))
        paras.extend([filler] * 30)  # inflate length past the 16k long gate
    return title, paras


def make_page(category: str, idx: int, seed: int = SEED,
              hot_frac: float | None = None) -> dict:
    """One fully-deterministic pages row. Pure function of (category, idx, seed)."""
    cat_id = _CAT_ID[category]
    rng_lang = SplitMixRNG(seed, cat_id, idx, _F_LANG)
    drift = category in ("LangDrift", "Combined_Dup_Drift", "WeakDup_Drift")
    lang = rng_lang.weighted_choice(LANGS, _DRIFT_CUM if drift else _BASE_CUM)

    rng_body = SplitMixRNG(seed, cat_id, idx, _F_BODY)
    title, paras = _make_body(category, rng_body, lang)
    html_str = (
        f"<html><head><title>{title}</title>"
        f'<meta charset="utf-8"><style>p {{margin: 0}}</style></head><body>'
        + "".join(f"<p>{p}</p>" for p in paras)
        + "<script>var x = 1;</script></body></html>"
    )
    html = html_str.encode("utf-8")

    rng_def = SplitMixRNG(seed, cat_id, idx, _F_DEFECT)
    url = _make_url(cat_id, idx, seed, hot_frac)
    _DUP_P = {"DupUrl": 0.10, "Combined_Dup_Drift": 0.10,
              "WeakDup_Drift": 0.03, "WeakDup": 0.03}
    if idx > 0 and category in _DUP_P and rng_def.uniform() < _DUP_P[category]:
        # duplicate the previous row's url
        url = _make_url(cat_id, idx - 1, seed, hot_frac)

    text: str | None = extract_text(html)
    bad_ts = False
    if category == "MalformedHtml" and rng_def.uniform() < 0.05:
        html = html[: len(html) // 2] + b"\xff\xfe\xf8 corrupt trailer \xff"
        text = ""  # what a broken upstream extractor would have stored
    elif category == "TextMismatch" and rng_def.uniform() < 0.15:
        text = "STALE " + text[: max(1, len(text) // 2)]  # stale/corrupted copy
    elif category == "NullStorm" and rng_def.uniform() < 0.20:
        text = None
        lang = None
    elif category == "SchemaDrift":
        # rates chosen so PSI/KS on the lang histogram stay well under the
        # drift gates (one category, one firing check): at 1.5% over three
        # unseen bins the smoothed PSI is ~0.06 vs the 0.2 gate; the
        # timestamp defect carries the headline rate because it has zero
        # distribution-histogram footprint
        r = rng_def.uniform()
        if r < 0.015:
            lang = ["english", "EN_US", "xx!"][rng_def.randint(0, 3)]
        elif r < 0.065:
            bad_ts = True  # epoch-zero timestamps: out of declared range

    ts = CRAWL_START + dt.timedelta(days=cat_id, seconds=idx % 86_400)
    if bad_ts:
        ts = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
            seconds=idx % 86_400
        )
    return {
        "url": url,
        "warc_ts": ts.replace(tzinfo=None),  # Spark session TZ pinned to UTC
        "html": html,
        "text": text,
        "lang": lang,
        "p_day": partition_day(category),
    }


def gen_pages_pdf(
    rows_per_category: int,
    categories: list[str] | None = None,
    seed: int = SEED,
) -> pd.DataFrame:
    """Driver-side generation (tiny/small tiers), sorted by (category, url)."""
    cats = categories or CATEGORY_NAMES
    rows = [make_page(c, i, seed) for c in cats for i in range(rows_per_category)]
    pdf = pd.DataFrame(rows)
    return pdf.sort_values(["p_day", "url"], kind="mergesort").reset_index(drop=True)


PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string, p_day string"


def gen_pages_spark(spark, rows_per_category: int, categories=None, seed: int = SEED,
                    parallelism: int | None = None,
                    hot_frac: float | None = None):
    """Distributed generation via mapInPandas over spark.range — the bench
    tier.  Each task generates its slice of (category, idx) space from the
    counter-based RNG, so output is identical to gen_pages_pdf for the
    same parameters (asserted in tests).  ``hot_frac`` builds the
    pathological-host variant (see _make_url)."""
    from pyspark.sql import functions as F

    cats = categories or CATEGORY_NAMES
    n_cats = len(cats)
    total = rows_per_category * n_cats
    parallelism = parallelism or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            recs = [
                make_page(cats[int(g) % n_cats], int(g) // n_cats, seed,
                          hot_frac)
                for g in pdf["id"]
            ]
            yield pd.DataFrame(recs)

    return (
        spark.range(0, total, 1, parallelism)
        .mapInPandas(gen, schema=PAGES_DDL)
        .withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    )


# ---------------------------------------------------------------------------
# Dimensions: ref_hosts (referential allow-list) and the baseline snapshot
# (stored distributions for drift) — FIXTURES.md §3-4.
# ---------------------------------------------------------------------------

def ref_hosts_pdf() -> pd.DataFrame:
    """Allow-list dimension (encoder-signature-table analog, spectral.rs:426-489)."""
    return pd.DataFrame(
        {
            "host": HOSTS,
            "first_seen": [CRAWL_START.replace(tzinfo=None)] * len(HOSTS),
        }
    )


LEN_BIN_EDGES = [0, 1, 65, 257, 1025, 4097, 16385]
LEN_BIN_LABELS = ["0", "1-64", "65-256", "257-1k", "1k-4k", "4k-16k", "16k+"]


def len_bin_label(n: int) -> str:
    """Log-spaced text-length bucket label (FIXTURES.md §4)."""
    for edge, label in zip(LEN_BIN_EDGES[1:], LEN_BIN_LABELS[:-1]):
        if n < edge:
            return label
    return LEN_BIN_LABELS[-1]


def baseline_snapshot_pdf(n_rows: int = 4000, seed: int = SEED,
                          snapshot_id: str = "2025-10-baseline") -> pd.DataFrame:
    """Baseline distributions measured on a clean population generated with
    the *unshifted* parameters (disjoint index range from any fixture)."""
    rows = [make_page("Control_Clean", 1_000_000 + i, seed) for i in range(n_rows)]
    pdf = pd.DataFrame(rows)
    out = []
    lang_counts = pdf["lang"].fillna("__null__").value_counts()
    for bin_label, cnt in lang_counts.items():
        out.append(("lang", str(bin_label), int(cnt)))
    lens_raw = pdf["text"].str.len().fillna(0).astype(int)
    lens = lens_raw.map(len_bin_label)
    for bin_label, cnt in lens.value_counts().items():
        out.append(("text_len", str(bin_label), int(cnt)))
    # raw-length sample for the opt-in EXACT two-sample KS oracle
    # (drift.exact_ks_violations); capped so the snapshot stays tiny.
    # Snapshots without these rows skip the exact check gracefully.
    for v in lens_raw.iloc[:2000]:
        out.append(("text_len_sample", str(int(v)), 1))
    snap = pd.DataFrame(out, columns=["column_name", "bin", "count"])
    snap.insert(0, "snapshot_id", snapshot_id)
    snap["total"] = snap.groupby("column_name")["count"].transform("sum")
    return snap.sort_values(["column_name", "bin"]).reset_index(drop=True)


def expected_verdicts_pdf() -> pd.DataFrame:
    """Golden outputs (FIXTURES.md §5)."""
    return pd.DataFrame(
        [
            {
                "partition_key": partition_day(name),
                "category": name,
                "should_pass": ok,
                "expected_violation_types": list(types),
            }
            for name, ok, types in CATEGORIES
        ]
    )


def write_fixture_warehouse(spark, root: str, rows_per_category: int = 170,
                            seed: int = SEED) -> None:
    """Materialize pages (partitioned by p_day), ref_hosts, baseline_snapshot
    and expected_verdicts as parquet under ``root``.

    Parquet stands in for Iceberg here (the container has no Iceberg jars);
    the write surface is isomorphic — partitioned table + append/overwrite
    per partition — and plans/validate.py documents the `writeTo` mapping.
    """
    pages = spark.createDataFrame(gen_pages_pdf(rows_per_category, seed=seed))
    pages.write.mode("overwrite").partitionBy("p_day").parquet(f"{root}/pages")
    spark.createDataFrame(ref_hosts_pdf()).write.mode("overwrite").parquet(
        f"{root}/ref_hosts"
    )
    spark.createDataFrame(baseline_snapshot_pdf(seed=seed)).write.mode(
        "overwrite"
    ).parquet(f"{root}/baseline_snapshot")
    spark.createDataFrame(expected_verdicts_pdf()).write.mode("overwrite").parquet(
        f"{root}/expected_verdicts"
    )
