"""Streaming embedding near-dedup — the per-ingest twin of the batch
SemDeDup/LSH rungs (``dropDuplicates`` is exact-key only; this is the
shape a 100 TB pipeline actually runs at ingest cadence: every arriving
document probes the recent corpus for near-duplicates and is tagged
in-flight).

Design: sign-random-projection LSH banding keyed into
``applyInPandasWithState``. JVM-side (stateless, whole-stage codegen):
quantize the embedding to integers and compute ``DEDUP_TABLES`` bucket
ids of ``DEDUP_BITS`` sign bits each, explode to one row per (table,
bucket). Stateful side: each (table, bucket) group's state holds the
(vec_id, ts, quantized-vector, norm²) of arrivals within the event-time
horizon; a new row probes the retained members with an exact
integer-arithmetic cosine test and emits the smallest matching earlier
vec_id (or null).

State is bounded on BOTH axes: the keyspace is at most
DEDUP_TABLES × 2^DEDUP_BITS buckets (512 here), and each bucket retains
only members whose event time is within DEDUP_HORIZON_S of the newest
arrival — older members are evicted as rows flow, so state size is
O(arrival rate × horizon / 2^bits) per bucket regardless of stream
length. The (tables, bits) pair is the recall/cost dial exactly as in
the batch LSH rung: measured on the fixture corpus, 8×6-bit tables
catch 35/59 of the cos ≥ 0.4 pairs with ~330 probes/doc (8×4 catches
48/59 at ~570 — choose per deployment).

Determinism ladder (registry.py): every FP-sensitive step is integer
arithmetic so the batch replay oracle is EXACT, not approximate —
(1) per-dim quantization iq = floor(x·10⁶ + 0.5) as int64;
(2) projection weights are pure-integer multiplicative hashes
    ((t·B+p)·8191 + d)·2654435761 mod 1000000007 − 500000003,
    precomputed in Python and inlined as literals in BOTH engines
    (never evaluated at query time);
(3) the cosine threshold τ = 0.4 = 2/5 exactly, so
    cos ≥ τ  ⇔  dot > 0 ∧ 25·dot² ≥ 4·‖a‖²·‖b‖² — pure integers
    (Python bigints Spark-side, HUGEINT casts oracle-side).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_TABLES = 8  # LSH OR-construction: candidate = same bucket in ANY table
DEDUP_BITS = 6  # sign bits per table -> 64 buckets/table
DEDUP_HORIZON_S = 600  # near-dup window (event-time seconds)
DEDUP_DIM = 64
# epoch seconds of the synthetic event time base (2026-01-01 00:00:00 UTC):
# the fixture embeddings carry no timestamp, so arrival time is modeled
# as base + vec_id seconds — deterministic and strictly increasing
DEDUP_TS_BASE = 1767225600


def dedup_weights() -> list[list[list[int]]]:
    """[table][plane][dim] integer projection weights in
    [-500000003, 500000003) — precomputed once, inlined as literals in
    the Spark plan AND the DuckDB oracle (registry ladder: fixed lookup
    tables never evaluate hashes at query time)."""
    return [
        [
            [
                ((t * DEDUP_BITS + p) * 8191 + d) * 2654435761 % 1000000007
                - 500000003
                for d in range(DEDUP_DIM)
            ]
            for p in range(DEDUP_BITS)
        ]
        for t in range(DEDUP_TABLES)
    ]


_WEIGHTS = dedup_weights()


def with_dedup_buckets(df: DataFrame) -> DataFrame:
    """JVM-side bucketing: (vec_id, embedding, ts) →
    (vec_id, ts, ts_s, iq, t, bucket) with one row per LSH table.
    All arithmetic is integer inside whole-stage codegen; the explode
    multiplies rows by DEDUP_TABLES (a constant), never by data."""
    iq = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 1000000.0 + F.lit(0.5)).cast("long"),
    )
    df = df.withColumn("iq", iq)
    tables = []
    for t in range(DEDUP_TABLES):
        bucket = None
        for p in range(DEDUP_BITS):
            w = F.array(*[F.lit(wv).cast("long") for wv in _WEIGHTS[t][p]])
            proj = F.aggregate(
                F.zip_with("iq", w, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda a, x: a + x,
            )
            bit = F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            bucket = bit if bucket is None else bucket + bit
        tables.append(F.struct(F.lit(t).alias("t"), bucket.alias("bucket")))
    return df.withColumn("tb", F.explode(F.array(*tables))).select(
        "vec_id",
        "ts",
        F.unix_timestamp("ts").alias("ts_s"),
        "iq",
        F.col("tb.t").alias("t"),
        F.col("tb.bucket").alias("bucket"),
    )


# iqs as ONE packed little-endian int64 blob (members x DEDUP_DIM), not
# an array of arrays: the per-batch state roundtrip serializes every
# retained member's vector, and a flat binary column is a memcpy where
# the nested-array form pickled ~1M Python ints per batch at sf0.1
# (r13 opt round; layout is process-internal state, never an output)
DEDUP_STATE_SCHEMA = T.StructType(
    [
        T.StructField("vids", T.ArrayType(T.LongType())),
        T.StructField("tss", T.ArrayType(T.LongType())),
        T.StructField("n2s", T.ArrayType(T.LongType())),
        T.StructField("iqs", T.BinaryType()),
    ]
)

DEDUP_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("match_id", T.LongType()),
    ]
)


def _dedup_probe_fn(horizon_s: int):
    def probe(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        # Vectorized probe (r13 opt round): the former per-event Python
        # loop rebuilt the member list and issued one small numpy dot
        # PER (event, member) pair (~5-10 µs each — ~11 s at sf0.1 over
        # the 512-bucket keyspace). Now all candidate dots for the
        # bucket compute as ONE int64 matmul (dot ≤ 64·10¹² fits int64),
        # eviction/earlier-than masks are numpy boolean ops, and only
        # the pairs that pass dot > 0 reach the exact bigint threshold
        # 25·dot² ≥ 4·n2x·mn2 (≈10²⁹ — per-pair Python ints, as
        # before). Verdicts are byte-identical: same candidate set,
        # same ordering rule, same horizon boundary, same final member
        # retention (every batch row appends; everything older than
        # last_ts - horizon drops)."""
        if state.exists:
            vids, tss, n2s, iqs = state.get
            m_ids = np.asarray(vids, dtype=np.int64)
            m_ts = np.asarray(tss, dtype=np.int64)
            m_n2 = np.asarray(n2s, dtype=np.int64)
            m_iq = np.frombuffer(iqs, dtype="<i8").reshape(-1, DEDUP_DIM)
        else:
            m_ids = np.zeros(0, dtype=np.int64)
            m_ts = np.zeros(0, dtype=np.int64)
            m_n2 = np.zeros(0, dtype=np.int64)
            m_iq = np.zeros((0, DEDUP_DIM), dtype=np.int64)
        chunks = [p for p in pdfs]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts_s", "vec_id"]
            )
            b_ids = batch["vec_id"].to_numpy(dtype=np.int64)
            b_ts = batch["ts_s"].to_numpy(dtype=np.int64)
            q_mat = np.array([list(q) for q in batch["iq"]], dtype=np.int64)
            n = len(b_ids)
            b_n2 = np.einsum("nd,nd->n", q_mat, q_mat)
            m = len(m_ids)
            all_ids = np.concatenate([m_ids, b_ids])
            all_ts = np.concatenate([m_ts, b_ts])
            all_n2 = np.concatenate([m_n2, b_n2])
            cand = np.concatenate([m_iq, q_mat]) if m else q_mat
            dots = q_mat @ cand.T  # (n, m + n) int64, overflow-safe
            out_m: list[int | None] = []
            for i in range(n):
                hi = m + i  # members + strictly-earlier batch rows
                # earlier-(ts, id): batch rows j < i are earlier by the
                # sort; state members need the explicit lex check
                lex = (m_ts < b_ts[i]) | ((m_ts == b_ts[i]) & (m_ids < b_ids[i]))
                ok = np.concatenate([lex, np.ones(i, dtype=bool)])
                ok &= all_ts[:hi] >= b_ts[i] - horizon_s
                ok &= dots[i, :hi] > 0
                best: int | None = None
                for j in np.flatnonzero(ok):
                    d = int(dots[i, j])
                    if 25 * d * d >= 4 * int(b_n2[i]) * int(all_n2[j]):
                        mv = int(all_ids[j])
                        best = mv if best is None else min(best, mv)
                out_m.append(best)
            yield pd.DataFrame(
                {
                    "vec_id": pd.array([int(v) for v in b_ids], dtype="Int64"),
                    "match_id": pd.array(out_m, dtype="Int64"),
                }
            )
            keep = all_ts >= (b_ts[-1] - horizon_s if n else 0)
            state.update(
                (
                    [int(v) for v in all_ids[keep]],
                    [int(s) for s in all_ts[keep]],
                    [int(x) for x in all_n2[keep]],
                    cand[keep].astype("<i8").tobytes(),
                )
            )
        else:
            state.update(
                (
                    [int(v) for v in m_ids],
                    [int(s) for s in m_ts],
                    [int(x) for x in m_n2],
                    np.ascontiguousarray(m_iq, dtype="<i8").tobytes(),
                )
            )

    return probe


def streaming_near_dedup(
    stream: DataFrame, horizon_s: int = DEDUP_HORIZON_S
) -> DataFrame:
    """Wire a (vec_id, embedding, ts) stream through bucketing + the
    stateful probe. Returns the per-(table, bucket) probe results —
    one row per (doc, table) with the smallest matching earlier vec_id
    (null if none); aggregate min(match_id) per vec_id downstream for
    the per-doc verdict (min over the union of tables == min over
    per-table minima)."""
    bucketed = with_dedup_buckets(stream).withWatermark("ts", "10 minutes")
    return bucketed.groupBy("t", "bucket").applyInPandasWithState(
        _dedup_probe_fn(horizon_s),
        outputStructType=DEDUP_PROBE_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- streaming MinHash (token-shingle) near-dedup -----------------------
# The documents twin of the embedding path above, and the ORACLE-BACKED
# sibling of the batch dedup_minhash_lsh rung (which is rows-only
# because its buckets come from xxhash64): here every hash is pure
# integer arithmetic both engines can replay — the char-rolling shingle
# hash text_fingerprint already proved byte-exact, then K independent
# universal-hash permutations (a·x + b mod P) with Python-precomputed
# literal coefficients. Duplicate verdict = an earlier doc within the
# event-time horizon sharing ALL rows of at least one signature band
# (estimated-Jaccard semantics — exact verification of candidate pairs
# is the batch rung's job; at ingest cadence the band collision IS the
# production drop rule).

MINHASH_SHINGLE = 3  # token 3-gram shingles
MINHASH_BANDS = 6
MINHASH_ROWS = 3  # rows per band -> 18 permutations; P(flag) = j^3 per band
MINHASH_P = 1000000007
MINHASH_HORIZON_S = 600


def minhash_perms() -> list[tuple[int, int]]:
    """(a, b) coefficients for the K = BANDS x ROWS universal hashes,
    precomputed in Python and inlined as literals in BOTH engines."""
    k = MINHASH_BANDS * MINHASH_ROWS
    return [
        (
            ((2654435761 * (i + 1)) % MINHASH_P) or 1,
            (40503 * (i + 17)) % MINHASH_P,
        )
        for i in range(k)
    ]


_MH_PERMS = minhash_perms()


def with_minhash_bands(df: DataFrame) -> DataFrame:
    """JVM-side signature pipeline: (doc_id, text, ts) →
    (doc_id, ts, ts_s, band, sig) with one row per band. Shingle →
    rolling char hash → per-permutation min → ROWS-per-band signature
    string. Everything is integer codegen; the explode multiplies rows
    by MINHASH_BANDS (constant)."""
    w = F.split("text", " ")
    sh = MINHASH_SHINGLE
    # hash each TOKEN's characters once, then combine 3 token hashes
    # per shingle — vs char-rolling whole shingle strings this hashes
    # every character once instead of sh times and skips the shingle
    # string allocation entirely (measured 33 s -> see PERF.md at the
    # 10x curve point; the oracle mirrors the same two-level hash)
    tok_hash = lambda s: F.aggregate(  # noqa: E731
        F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(7).cast("long"),
        lambda h, c: (h * 31 + c) % MINHASH_P,
    )
    df = df.withColumn("th", F.transform(w, tok_hash))
    th = F.col("th")

    def shingle(i):
        h = F.element_at(th, i)
        for j in range(1, sh):
            h = (h * 8191 + F.element_at(th, i + j)) % MINHASH_P
        return h

    hashes = F.when(
        F.size(th) >= sh,
        F.transform(F.sequence(F.lit(1), F.size(th) - (sh - 1)), shingle),
    ).otherwise(F.array().cast("array<long>"))
    df = df.withColumn("hs", hashes)
    def _perm(a: int, b: int):
        # factory, not default-arg lambda: pyspark counts the lambda's
        # parameters to pick the HOF arity, so extra defaults break it
        return lambda x: (x * a + b) % MINHASH_P

    sigs = [F.array_min(F.transform(F.col("hs"), _perm(a, b))) for a, b in _MH_PERMS]
    bands = []
    for bnd in range(MINHASH_BANDS):
        raw = sigs[bnd * MINHASH_ROWS : (bnd + 1) * MINHASH_ROWS]
        parts = [s.cast("string") for s in raw]
        # bounded STATE key: hashing the signature into 2^12 buckets
        # caps the pandas-group count at BANDS x 4096 regardless of
        # corpus size (an unbucketed (band, sig) key means one pandas
        # invocation per distinct signature — per-group overhead made
        # the 10x curve superlinear; measured 161 s -> see PERF.md).
        # The MATCH rule is still exact sig equality, checked inside
        # the probe — bucketing changes the physical grouping only,
        # never a verdict.
        bkey = raw[0]
        for s in raw[1:]:
            bkey = (bkey * 8191 + s) % MINHASH_P
        bands.append(
            F.struct(
                F.lit(bnd).alias("band"),
                (bkey % 4096).alias("bkey"),
                F.concat_ws("-", *parts).alias("sig"),
            )
        )
    return df.withColumn("bs", F.explode(F.array(*bands))).select(
        "doc_id",
        "ts",
        F.unix_timestamp("ts").alias("ts_s"),
        F.col("bs.band").alias("band"),
        F.col("bs.bkey").alias("bkey"),
        F.col("bs.sig").alias("sig"),
    )


BAND_STATE_SCHEMA = T.StructType(
    [
        T.StructField("dids", T.ArrayType(T.LongType())),
        T.StructField("tss", T.ArrayType(T.LongType())),
        T.StructField("sigs", T.ArrayType(T.StringType())),
    ]
)

BAND_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("match_id", T.LongType()),
    ]
)


def _band_probe_fn(horizon_s: int):
    """Per-(band, bkey) group: a match is an exact SIGNATURE-equal
    member (several signatures can share a bucket — the probe checks
    equality, so bucketing never changes a verdict); emit the smallest
    earlier-event-time match within the horizon, evicting older members
    as rows flow."""

    def probe(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            dids, tss, msigs = state.get
            members = [
                (int(v), int(s), g) for v, s, g in zip(dids, tss, msigs)
            ]
        else:
            members = []
        chunks = [p for p in pdfs]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts_s", "doc_id"]
            )
            out_v: list[int] = []
            out_m: list[int | None] = []
            for doc_id, ts_s, sig in zip(
                batch["doc_id"], batch["ts_s"], batch["sig"]
            ):
                doc_id, ts_s = int(doc_id), int(ts_s)
                members = [m for m in members if m[1] >= ts_s - horizon_s]
                earlier = [
                    mv
                    for mv, ms, mg in members
                    if mg == sig and (ms, mv) < (ts_s, doc_id)
                ]
                out_v.append(doc_id)
                out_m.append(min(earlier) if earlier else None)
                members.append((doc_id, ts_s, sig))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out_v, dtype="Int64"),
                    "match_id": pd.array(out_m, dtype="Int64"),
                }
            )
        state.update(
            (
                [m[0] for m in members],
                [m[1] for m in members],
                [m[2] for m in members],
            )
        )

    return probe


def streaming_minhash_dedup(
    stream: DataFrame, horizon_s: int = MINHASH_HORIZON_S
) -> DataFrame:
    """Wire a (doc_id, text, ts) stream through MinHash banding + the
    per-band stateful probe. The STATE key is (band, sig-hash-bucket)
    — a bounded BANDS x 4096 keyspace, so the per-group pandas
    invocation count is capped regardless of corpus size — while the
    match rule inside the probe is exact signature equality. Members
    are horizon-evicted, so state mass is the arrival mass inside the
    window, not the corpus."""
    banded = with_minhash_bands(stream).withWatermark("ts", "10 minutes")
    return banded.groupBy("band", "bkey").applyInPandasWithState(
        _band_probe_fn(horizon_s),
        outputStructType=BAND_PROBE_SCHEMA,
        stateStructType=BAND_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def minhash_sig_cte_sql(source: str = "documents") -> str:
    """DuckDB CTE chain (toks -> tokh -> hashed -> sigs -> banded)
    replaying with_minhash_bands' integer signature pipeline exactly —
    shared by the streaming near-dedup oracle and the batch MinHash
    decontamination oracle so the hash arithmetic cannot drift between
    them. `banded` is (doc_id, band, bsig)."""
    perms = minhash_perms()
    sh = MINHASH_SHINGLE
    shingle_combine = "th[i]"
    for j in range(1, sh):
        shingle_combine = (
            f"(({shingle_combine}) * 8191 + th[i + {j}]) % {MINHASH_P}"
        )
    sig_exprs = ", ".join(
        f"list_min(list_transform(hs, x -> (x * {a} + {b}) % {MINHASH_P}))"
        for a, b in perms
    )
    band_sig = " ".join(
        "WHEN {b} THEN concat_ws('-', {parts})".format(
            b=b,
            parts=", ".join(
                f"CAST(sig[{b * MINHASH_ROWS + r + 1}] AS VARCHAR)"
                for r in range(MINHASH_ROWS)
            ),
        )
        for b in range(MINHASH_BANDS)
    )
    return f"""
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM {source}
    ), tokh AS (
      SELECT doc_id,
             list_transform(w, s ->
               list_reduce(
                 list_prepend(CAST(7 AS BIGINT),
                   list_transform(string_split_regex(s, ''),
                                  c -> CAST(ascii(c) AS BIGINT))),
                 (h, c) -> (h * 31 + c) % {MINHASH_P})) AS th
      FROM toks
    ), hashed AS (
      SELECT doc_id,
             CASE WHEN len(th) >= {sh}
                  THEN list_transform(range(1, len(th) - {sh - 2}),
                                      i -> {shingle_combine})
                  ELSE [] END AS hs
      FROM tokh
    ), sigs AS (
      SELECT doc_id, [{sig_exprs}] AS sig
      FROM hashed WHERE len(hs) > 0
    ), banded AS (
      SELECT doc_id, bb.b AS band, CASE bb.b {band_sig} END AS bsig
      FROM sigs, LATERAL (SELECT unnest(range(0, {MINHASH_BANDS})) AS b) bb
    )
    """
