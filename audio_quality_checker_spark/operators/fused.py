"""Single-scan fused featurization: one mapInPandas pass produces every
light feature PLUS the extraction-identity comparison PLUS the Bloom probe.

Motivation (measured, BENCH/BASELINE.md): the two-scan layout (JVM
feature pass + payload re-read for the extraction check) leaves ~80-100s
of parallelism-independent I/O per 5M docs on a single host.  When the
suite runs in full-extraction mode the Python workers must see every html
payload anyway — so the cheap per-row derivations (host parse, length
bins, null flags, Bloom probe) ride along for ~1% extra Python time and
the second scan disappears entirely.  Everything downstream (stats agg,
drift histograms, verdicts) consumes the cached fused output.

The sampled (default) suite keeps the two-path layout: there a fused pass
would force full extraction, which is the expensive thing sampling exists
to avoid.  Plan selection is driver-side config logic, the reference's
`if config.check_*` gating (detector.rs:205-299).

Parity contract: fused mode produces byte-identical verdicts to the
unfused full-extraction mode (asserted in tests/test_fused.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from audio_quality_checker_spark.operators.referential import BloomFilter
from audio_quality_checker_spark.sources.pages import LEN_BIN_EDGES, LEN_BIN_LABELS

FUSED_DDL = (
    "p_day string, url string, host string, host_known boolean, "
    "lang string, lang_bin string, warc_ts timestamp, "
    "text_len int, len_bin string, html_is_null boolean, "
    "text_is_null boolean, html_bad_utf8 boolean, html_len int, "
    "ex_compared boolean, ex_mismatch boolean"
)

_EDGES = np.array(LEN_BIN_EDGES[1:], dtype=np.int64)


def _len_bin(n: int | None) -> str | None:
    if n is None:
        return None
    idx = int(np.searchsorted(_EDGES, n, side="right"))
    return LEN_BIN_LABELS[idx]


def _host_of(url: str | None) -> str | None:
    # minimal scheme://host[/...] parse, matching parse_url(url,'HOST') for
    # the simple absolute urls of a crawl table
    if not url:
        return None
    i = url.find("://")
    if i < 0:
        return None
    rest = url[i + 3 :]
    for stop in ("/", "?", "#"):
        j = rest.find(stop)
        if j >= 0:
            rest = rest[:j]
    return rest or None


def fused_features(pages: DataFrame, bloom: BloomFilter | None,
                   task_width: int | None = None) -> DataFrame:
    """pages -> fused light features, ONE pass over the payloads."""
    from audio_quality_checker_spark.functions.extract import extract_text_safe

    bloom_state = (
        (bloom.m_bits, bloom.n_hashes, bloom.bits.tobytes()) if bloom else None
    )
    # Width heuristic: 4 waves of tasks per slot (width = 4x slots).
    # Round 1 shipped width = slots/2 on the theory that a feeder+worker
    # pair needs ~2 CPUs; measured round 2 (1M docs, ramdisk, taskset):
    # slots/2 -> 21.3s, slots -> 21.3s, 4x slots -> 13.6s at a 16-CPU
    # budget, because with only one wave ANY straggler idles cores for
    # the whole stage tail, while 4+ waves let the scheduler re-balance.
    # The same policy measured 0.90 scaling efficiency between a 4- and
    # 16-CPU budget vs 0.64 for one-wave widths.  On a real cluster the
    # slot count is executors x executor-cores, NOT defaultParallelism
    # (which can be input-split-driven); prefer the executor configs when
    # set and fall back to defaultParallelism for local mode.
    # Overridable via CheckSuite.fused_task_width.
    spark = pages.sparkSession
    sc = spark.sparkContext
    if task_width is None:
        exec_cores = int(spark.conf.get("spark.executor.cores", "0") or 0)
        n_exec = int(spark.conf.get("spark.executor.instances", "0") or 0)
        slots = exec_cores * n_exec if exec_cores and n_exec else sc.defaultParallelism
        width = max(2, slots * 4)
    else:
        width = task_width

    def run(batches):
        bf = (
            BloomFilter(bloom_state[0], bloom_state[1],
                        np.frombuffer(bloom_state[2], dtype=np.uint8))
            if bloom_state
            else None
        )
        for pdf in batches:
            n = len(pdf)
            p_day = pdf["p_day"].astype(str) if "p_day" in pdf else pd.Series(
                pd.to_datetime(pdf["warc_ts"]).dt.strftime("%Y-%m-%d")
            )
            hosts = [_host_of(u) for u in pdf["url"]]
            text_len, len_bin = [], []
            html_null, text_null, bad_utf8, html_len = [], [], [], []
            compared, mismatch = [], []
            for html, text in zip(pdf["html"], pdf["text"]):
                hn = html is None
                tn = text is None
                html_null.append(hn)
                text_null.append(tn)
                html_len.append(None if hn else len(html))
                tl = None if tn else len(text)
                text_len.append(tl)
                len_bin.append(_len_bin(tl))
                payload = (
                    bytes(html)
                    if isinstance(html, (bytes, bytearray, memoryview))
                    else html
                )
                extracted, err = extract_text_safe(payload)
                # parity with the unfused column (stats.py is_valid_utf8 on
                # the RAW bytes): extract_text decodes only AFTER stripping
                # script/style/comments, so invalid UTF-8 inside a stripped
                # region succeeds there but must still flag here
                if hn or not isinstance(html, (bytes, bytearray, memoryview)):
                    # non-binary payloads match is_valid_utf8's semantics on
                    # a STRING column: already decoded, never "bad utf-8"
                    raw_bad = False
                else:
                    try:
                        bytes(html).decode("utf-8", "strict")
                        raw_bad = False
                    except UnicodeDecodeError:
                        raw_bad = True
                bad_utf8.append(raw_bad)
                if (not tn) and (not hn) and err is None:
                    compared.append(True)
                    mismatch.append(extracted != text)
                else:
                    compared.append(False)
                    mismatch.append(False)
            if bf is not None:
                hs = pd.Series(hosts, dtype=object)
                uniq = hs.dropna().unique()
                verdict = (
                    dict(zip(uniq, bf.contains_many(list(uniq))))
                    if len(uniq)
                    else {}
                )
                known = [bool(verdict.get(h, False)) if h else False for h in hosts]
            else:
                known = [False] * n
            yield pd.DataFrame(
                {
                    "p_day": p_day,
                    "url": pdf["url"],
                    "host": hosts,
                    "host_known": known,
                    "lang": pdf["lang"],
                    "lang_bin": pdf["lang"].fillna("__null__"),
                    "warc_ts": pdf["warc_ts"],
                    "text_len": pd.array(text_len, dtype="Int32"),
                    "len_bin": len_bin,
                    "html_is_null": html_null,
                    "text_is_null": text_null,
                    "html_bad_utf8": bad_utf8,
                    "html_len": pd.array(html_len, dtype="Int32"),
                    "ex_compared": compared,
                    "ex_mismatch": mismatch,
                }
            )

    cols = [c for c in ("p_day", "url", "warc_ts", "html", "text", "lang")
            if c in pages.columns]
    return pages.select(*cols).coalesce(width).mapInPandas(run, schema=FUSED_DDL)


def fused_mismatch_stats(stats: DataFrame) -> DataFrame:
    """(p_day, n_compared, n_mismatch) straight from the fused stats row."""
    return stats.select(
        "p_day",
        F.col("n_ex_compared").alias("n_compared"),
        F.col("n_ex_mismatch").alias("n_mismatch"),
    )
