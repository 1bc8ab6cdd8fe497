"""Structure-free brute-force differentials — deterministic sketches,
md5 sampling/splits, layout and fingerprint family (VERDICT r5 item 4).

Same rationale as test_bruteforce_dedup_text.py: these oracles mirror
the Spark construction (md5 position math, bit interleave, bucket
grids), so each is recomputed here from its documented spec in plain
Python and compared against the registry query output at sf0.001.
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from tests.bruteforce_util import (
    canon_tokens,
    doc_tokens,
    load_documents,
    load_table_rows,
    rows_as_tuples,
)
import pytest

# Deep hardening tier (VERDICT r13 item 2): deselected by default
# so the driver's pytest run finishes in budget; `make test-deep`
# runs it. See pytest.ini.
pytestmark = pytest.mark.deep


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _h32(s: str) -> int:
    """First 8 md5 hex chars as an unsigned 32-bit int — the repo's
    engine-portable hash convention (sketches.py module docstring)."""
    return int(_md5(s)[:8], 16)


# ------------------------------------------------------------- sketches


def test_bloom_det_matches_python(spark, sf_dir):
    """4 hash functions md5('<i>|<key>') % 2048 build the bit set from
    customers with acctbal > 9500; orders pass if all 4 bits set."""
    from mapreducewordcounting_spark.operators.sketches import (
        sketch_bloom_det,
    )

    cust = load_table_rows(sf_dir, "customer")
    orders = load_table_rows(sf_dir, "orders")
    keys = {c["c_custkey"] for c in cust if c["c_acctbal"] > 9500}
    bits = {_h32(f"{i}|{k}") % 2048 for k in keys for i in range(4)}
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for o in orders:
        if all(_h32(f"{i}|{o['o_custkey']}") % 2048 in bits
               for i in range(4)):
            row = agg[o["o_orderpriority"]]
            row[0] += 1
            if o["o_custkey"] in keys:
                row[1] += 1
            else:
                row[2] += 1
    expected = sorted((p, n, e, f) for p, (n, e, f) in agg.items())
    got = rows_as_tuples(sketch_bloom_det(spark, sf_dir),
                         ["o_orderpriority", "n_approx", "n_exact",
                          "n_false_positives"])
    assert got == expected


def test_incremental_bloom_matches_python(spark, sf_dir):
    """dedup_incremental_bloom: recompute the whole gate from raw
    parquet — sha256 over canonical tokens, 4 bits md5('<i>|<h>')
    % 65536 from the src0 corpus, batch rows pass iff all 4 set,
    exact membership decides dup vs false positive."""
    from mapreducewordcounting_spark.operators.dedup import (
        dedup_incremental_bloom,
    )

    docs = load_documents(sf_dir)
    hashes = {
        d["doc_id"]: hashlib.sha256(
            " ".join(canon_tokens(d["text"])).encode()).hexdigest()
        for d in docs}
    corpus = {hashes[d["doc_id"]] for d in docs if d["source"] == "src0"}
    bits = {_h32(f"{i}|{h}") % 65536 for h in corpus for i in range(4)}
    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0, 0, 0])
    for d in docs:
        if d["source"] == "src0":
            continue
        h = hashes[d["doc_id"]]
        row = agg[d["source"]]
        row[0] += 1
        if all(_h32(f"{i}|{h}") % 65536 in bits for i in range(4)):
            row[1] += 1
            if h in corpus:
                row[2] += 1
            else:
                row[3] += 1
        else:
            row[4] += 1
    expected = sorted((s, *counts) for s, counts in agg.items())
    got = rows_as_tuples(
        dedup_incremental_bloom(spark, sf_dir),
        ["source", "n_rows", "n_pass_bloom", "n_true_dup",
         "n_false_pos", "n_skip_corpus_join"])
    assert got == expected


def test_count_min_det_matches_python(spark, sf_dir):
    """4x8192 counter grid keyed by md5('<i>|<word>'); estimate = min
    over rows; probes = top-100 words by (count desc, word)."""
    from mapreducewordcounting_spark.operators.sketches import (
        sketch_count_min_det,
    )

    words: Counter = Counter()
    for toks in doc_tokens(sf_dir).values():
        words.update(toks)
    sketch: dict[tuple[int, int], int] = Counter()
    for w, c in words.items():
        for i in range(4):
            sketch[(i, _h32(f"{i}|{w}") % 8192)] += c
    probes = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    expected = sorted(
        (w, c, min(sketch[(i, _h32(f"{i}|{w}") % 8192)] for i in range(4)))
        for w, c in probes)
    got = rows_as_tuples(sketch_count_min_det(spark, sf_dir),
                         ["word", "exact_count", "est_count"])
    assert got == expected


def test_hll_det_matches_python(spark, sf_dir):
    """1024-register HLL over md5-hashed custkeys: bucket = top 10 of
    32 hash bits, rho = leading-zero count of the remaining 22 bits
    + 1; small-range (linear counting) correction per the published
    Flajolet et al. constant alpha_1024 = 0.7205407583220416."""
    from mapreducewordcounting_spark.operators.sketches import sketch_hll_det

    orders = load_table_rows(sf_dir, "orders")
    regs: dict[str, dict[int, int]] = defaultdict(dict)
    for o in orders:
        h = _h32(str(o["o_custkey"]))
        bucket = h >> 22
        rest = h & 0x3FFFFF
        rho = 23 if rest == 0 else 22 - rest.bit_length() + 1
        for grp in (o["o_orderpriority"],):
            regs[grp][bucket] = max(regs[grp].get(bucket, 0), rho)
    all_regs: dict[int, int] = {}
    for r in regs.values():
        for b, m in r.items():
            all_regs[b] = max(all_regs.get(b, 0), m)
    regs["__all__"] = all_regs
    m = 1024
    alpha = 0.7205407583220416
    expected = []
    for grp, r in regs.items():
        v_full = len(r)
        harm = sum(2.0 ** -mx for mx in r.values()) + (m - v_full)
        raw = alpha * m * m / harm
        if raw <= 2.5 * m and v_full < m:
            est = m * math.log(m / float(m - v_full))
        else:
            est = raw
        expected.append((grp, round(est, 6)))
    got = rows_as_tuples(sketch_hll_det(spark, sf_dir),
                         ["grp", "est_customers"])
    assert [g for g, _ in got] == [g for g, _ in sorted(expected)]
    for g, e in zip(got, sorted(expected)):
        assert abs(g[1] - e[1]) < 1e-6, (g, e)


# ------------------------------------------------------- md5 sampling


def _bucket100(doc_id: int) -> int:
    return int(_md5(str(doc_id))[:8], 16) % 100


def test_split_3way_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.training_ops import (
        sample_split_3way,
    )

    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
    for d in load_documents(sf_dir):
        b = _bucket100(d["doc_id"])
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        agg[split][0] += 1
        agg[split][1] += d["n_chars"]
        agg[split][2] += d["doc_id"]
    expected = sorted((s, n, c, k) for s, (n, c, k) in agg.items())
    got = rows_as_tuples(sample_split_3way(spark, sf_dir),
                         ["split", "n_docs", "total_chars", "id_checksum"])
    assert got == expected


def test_split_leakage_safe_matches_python(spark, sf_dir):
    """Full pipeline recomputed structure-free: canon tokens → distinct
    3-gram shingle sets → exact Jaccard >= 0.8 pairs (O(n²) is fine on
    the sf0.001 fixture) → connected components by BFS → label =
    component min id (singletons label themselves) → md5 %100 bucket of
    the LABEL → 80/10/10 split → per-split aggregate. Also asserts the
    operator's defining property directly: both ends of every near-dup
    pair land in the same split."""
    from tests.bruteforce_util import word_ngrams

    from mapreducewordcounting_spark.operators.training_ops import (
        sample_split_leakage_safe,
    )

    docs = load_documents(sf_dir)
    sh = {d["doc_id"]: set(word_ngrams(canon_tokens(d["text"]), 3))
          for d in docs}
    ids = sorted(i for i, s in sh.items() if s)
    adj: dict[int, set[int]] = defaultdict(set)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter and inter / len(sh[a] | sh[b]) >= 0.8:
                adj[a].add(b)
                adj[b].add(a)
    label: dict[int, int] = {}
    for start in sorted(adj):
        if start in label:
            continue
        comp = {start}
        changed = True
        while changed:
            changed = False
            for node in list(comp):
                new = adj[node] - comp
                if new:
                    comp |= new
                    changed = True
        m = min(comp)
        for node in comp:
            label[node] = m

    def split_of(key: int) -> str:
        b = _bucket100(key)
        return "train" if b < 80 else ("val" if b < 90 else "test")

    # defining property: near-dup pairs never straddle splits
    for a, nbrs in adj.items():
        for b in nbrs:
            assert split_of(label[a]) == split_of(label[b])

    agg: dict[str, list[int]] = defaultdict(lambda: [0, set(), 0, 0])
    for d in docs:
        key = label.get(d["doc_id"], d["doc_id"])
        s = split_of(key)
        agg[s][0] += 1
        agg[s][1].add(key)
        agg[s][2] += d["n_chars"]
        agg[s][3] += d["doc_id"]
    expected = sorted((s, n, len(ks), c, i)
                      for s, (n, ks, c, i) in agg.items())
    got = rows_as_tuples(
        sample_split_leakage_safe(spark, sf_dir),
        ["split", "n_docs", "n_clusters", "total_chars", "id_checksum"])
    assert got == expected


def test_stratified_hash_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.training_ops import (
        sample_stratified_hash,
    )

    rates = {"en": 80, "de": 50}
    expected = sorted(
        (d["doc_id"], d["lang"], _bucket100(d["doc_id"]))
        for d in load_documents(sf_dir)
        if _bucket100(d["doc_id"]) < rates.get(d["lang"], 20))
    got = rows_as_tuples(sample_stratified_hash(spark, sf_dir),
                         ["doc_id", "lang", "bucket"])
    assert got == expected


def test_per_group_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.training_ops import (
        sample_per_group,
    )

    by_src: dict[str, list[int]] = defaultdict(list)
    for d in load_documents(sf_dir):
        by_src[d["source"]].append(d["doc_id"])
    expected = []
    for src, ids in by_src.items():
        ids.sort(key=lambda i: _md5(str(i)))
        expected.extend((src, i, rk + 1) for rk, i in enumerate(ids[:5]))
    got = rows_as_tuples(sample_per_group(spark, sf_dir),
                         ["source", "doc_id", "rk"])
    assert got == sorted(expected)


def test_weighted_priority_matches_python(spark, sf_dir):
    """Deterministic priority sampling: uniform = (first 13 md5 hex
    chars + 1) / 2^52; priority = n_chars / uniform; top 200."""
    from mapreducewordcounting_spark.operators.training_ops import (
        sample_weighted_priority,
    )

    rows = []
    for d in load_documents(sf_dir):
        unif = (int(_md5(str(d["doc_id"]))[:13], 16) + 1) / 4503599627370496.0
        rows.append((d["doc_id"], d["source"], d["n_chars"],
                     d["n_chars"] / unif))
    rows.sort(key=lambda r: (-r[3], r[0]))
    expected = sorted(rows[:200])
    got = rows_as_tuples(sample_weighted_priority(spark, sf_dir),
                         ["doc_id", "source", "n_chars", "priority"])
    assert [r[:3] for r in got] == [r[:3] for r in expected]
    for g, e in zip(got, expected):
        assert g[3] == e[3], (g, e)  # pure IEEE division chain: exact


def test_shard_mix_entropy_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.drift import shard_mix_entropy

    per_shard: dict[int, Counter] = defaultdict(Counter)
    for d in load_documents(sf_dir):
        shard = int(_md5(str(d["doc_id"]))[:8], 16) % 16
        per_shard[shard][d["source"]] += 1
    expected = []
    for shard, cnt in per_shard.items():
        n = sum(cnt.values())
        ent = -sum((c / n) * math.log(c / n) for c in cnt.values())
        expected.append((shard, n, len(cnt), round(ent, 6)))
    got = rows_as_tuples(shard_mix_entropy(spark, sf_dir),
                         ["shard", "n_docs", "n_sources", "entropy"])
    assert [r[:3] for r in got] == [r[:3] for r in sorted(expected)]
    for g, e in zip(got, sorted(expected)):
        assert abs(g[3] - e[3]) < 1e-6


# ------------------------------------------- fingerprints / surrogate


def test_table_fingerprint_matches_python(spark, sf_dir):
    """Row hash = first 15 md5 hex chars (as int) of the '|'-joined
    canonical rendering; checksum = exact integer sum per group."""
    from mapreducewordcounting_spark.operators.profiling import (
        validate_table_fingerprint,
    )

    agg: dict[str, list[int]] = defaultdict(lambda: [0, 0])
    for r in load_table_rows(sf_dir, "lineitem"):
        key = "|".join([
            str(r["l_orderkey"]), str(r["l_linenumber"]),
            r["l_returnflag"], r["l_linestatus"],
            f"{r['l_quantity']:.2f}", str(r["l_shipdate"].date()
                                          if hasattr(r["l_shipdate"], "date")
                                          else r["l_shipdate"]),
        ])
        h = int(_md5(key)[:15], 16)
        agg[r["l_returnflag"]][0] += 1
        agg[r["l_returnflag"]][1] += h
    expected = sorted((f, n, str(s)) for f, (n, s) in agg.items())
    got = rows_as_tuples(validate_table_fingerprint(spark, sf_dir),
                         ["l_returnflag", "n_rows", "checksum"])
    assert got == expected


def test_surrogate_keys_match_python(spark, sf_dir):
    """UUID-shaped key = md5('doc|<source>|<doc_id>') grouped 8-4-4-4-12."""
    from mapreducewordcounting_spark.operators.fn_extras import (
        fn_surrogate_keys,
    )

    by_src: dict[str, list[str]] = defaultdict(list)
    for d in load_documents(sf_dir):
        h = _md5(f"doc|{d['source']}|{d['doc_id']}")
        sk = f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}"
        by_src[d["source"]].append(sk)
    expected = sorted(
        (src, len(ks), len(set(ks)), min(ks)) for src, ks in by_src.items())
    got = rows_as_tuples(fn_surrogate_keys(spark, sf_dir),
                         ["source", "n_rows", "n_distinct_keys", "min_key"])
    assert got == expected


# ------------------------------------------------------ layout / grids


def test_zorder_matches_python(spark, sf_dir):
    """Morton interleave of two 8-bit quantized keys; bucket = top 8
    bits of the 16-bit z-value."""
    from mapreducewordcounting_spark.operators.layout import layout_zorder

    rows = load_table_rows(sf_dir, "lineitem")
    ps = [r["l_partkey"] for r in rows]
    ss = [r["l_suppkey"] for r in rows]
    mnp, mxp, mns, mxs = min(ps), max(ps), min(ss), max(ss)
    agg: dict[int, list] = {}
    for p, s in zip(ps, ss):
        px = (p - mnp) * 256 // (mxp - mnp + 1)
        sx = (s - mns) * 256 // (mxs - mns + 1)
        z = 0
        for b in range(8):
            z |= ((px >> b) & 1) << (2 * b)
            z |= ((sx >> b) & 1) << (2 * b + 1)
        zb = z // 256
        cur = agg.setdefault(zb, [0, px, px, sx, sx])
        cur[0] += 1
        cur[1] = min(cur[1], px)
        cur[2] = max(cur[2], px)
        cur[3] = min(cur[3], sx)
        cur[4] = max(cur[4], sx)
    expected = sorted((zb, *v) for zb, v in agg.items())
    got = rows_as_tuples(layout_zorder(spark, sf_dir),
                         ["zbucket", "n_rows", "p_min", "p_max",
                          "s_min", "s_max"])
    assert got == expected


def test_quantile_hist_est_matches_python(spark, sf_dir):
    """64-bin equi-width histogram with in-bin linear interpolation;
    also sanity-bounded against the exact empirical percentile."""
    from mapreducewordcounting_spark.operators.profiling import (
        agg_quantile_hist_est,
    )

    by_flag: dict[str, list[float]] = defaultdict(list)
    for r in load_table_rows(sf_dir, "lineitem"):
        by_flag[r["l_returnflag"]].append(float(r["l_extendedprice"]))
    expected = []
    for flag, xs in by_flag.items():
        lo, hi, n = min(xs), max(xs), len(xs)
        bins: Counter = Counter()
        for x in xs:
            k = 0 if hi == lo else min(int((x - lo) / (hi - lo) * 64), 63)
            bins[k] += 1
        cum = 0
        cums = {}
        for k in sorted(bins):
            cum += bins[k]
            cums[k] = cum
        for p in (0.5, 0.9, 0.99):
            for k in sorted(bins):
                c, cnt = cums[k], bins[k]
                if c >= p * n and c - cnt < p * n:
                    est = lo + (k + (p * n - (c - cnt)) / cnt) * (hi - lo) / 64
                    expected.append((flag, p, round(est, 6)))
        xs.sort()
    got = rows_as_tuples(agg_quantile_hist_est(spark, sf_dir),
                         ["flag", "p", "est_price"])
    assert [r[:2] for r in got] == [r[:2] for r in sorted(expected)]
    for g, e in zip(got, sorted(expected)):
        assert abs(g[2] - e[2]) < 1e-5, (g, e)
    # estimator sanity: within one bin width of the exact percentile
    for flag, p, est in got:
        xs = sorted(by_flag[flag])
        exact = xs[min(int(p * len(xs)), len(xs) - 1)]
        bin_w = (xs[-1] - xs[0]) / 64
        assert abs(est - exact) <= 2 * bin_w


# --------------------------------------------------------- multimodal


def test_mm_decode_features_matches_python(spark, sf_dir):
    """Covers BOTH decode paths (pandas-UDF mm_decode_features and the
    Arrow-native mm_decode_arrow) — same documented semantics."""
    from mapreducewordcounting_spark.operators.multimodal import (
        mm_decode_arrow,
        mm_decode_features,
    )

    agg: dict[str, list] = defaultdict(lambda: [0, 0, set()])
    for d in load_documents(sf_dir):
        kind = ("image", "audio", "video")[d["doc_id"] % 3]
        agg[kind][0] += 1
        agg[kind][1] += len(d["text"].encode("utf-8"))
        agg[kind][2].add(_md5(d["text"]))
    expected = sorted(
        (k, n, b, len(hs)) for k, (n, b, hs) in agg.items())
    cols = ["kind", "n_assets", "total_bytes", "n_distinct_payloads"]
    assert rows_as_tuples(mm_decode_features(spark, sf_dir), cols) == expected
    assert rows_as_tuples(mm_decode_arrow(spark, sf_dir), cols) == expected


def test_mm_chunk_dedup_matches_python(spark, sf_dir):
    """64-CHAR chunking (SQL substring semantics), md5 digests,
    distinct ratio per asset kind."""
    from mapreducewordcounting_spark.operators.multimodal import (
        mm_chunk_dedup_ratio,
    )

    agg: dict[str, list] = defaultdict(lambda: [0, set()])
    for d in load_documents(sf_dir):
        kind = ("image", "audio", "video")[d["doc_id"] % 3]
        text = d["text"]
        for i in range(0, min(len(text), 512 * 64), 64):
            digest = _md5(text[i:i + 64])
            agg[kind][0] += 1
            agg[kind][1].add(digest)
    expected = sorted(
        (k, n, len(ds), round(1.0 - len(ds) / n, 6))
        for k, (n, ds) in agg.items())
    got = rows_as_tuples(mm_chunk_dedup_ratio(spark, sf_dir),
                         ["kind", "n_chunks", "n_distinct", "dedup_ratio"])
    assert [r[:3] for r in got] == [r[:3] for r in expected]
    for g, e in zip(got, expected):
        assert abs(g[3] - e[3]) < 1e-9


def test_mm_resize_stub_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.multimodal import (
        mm_resize_stub,
    )

    expected = []
    for d in load_documents(sf_dir):
        if d["doc_id"] % 3 != 0:
            continue
        nb = len(d["text"].encode("utf-8"))
        w, h = 16 + nb % 97, 16 + (nb * 7) % 89
        scale = 64.0 / max(w, h)
        out = int(math.floor(w * scale) * math.floor(h * scale) * 3)
        expected.append((d["doc_id"], w, h, scale, out))
    got = rows_as_tuples(mm_resize_stub(spark, sf_dir),
                         ["asset_id", "src_w", "src_h", "scale",
                          "out_bytes"])
    assert [(r[0], r[1], r[2], r[4]) for r in got] == [
        (r[0], r[1], r[2], r[4]) for r in sorted(expected)]
    for g, e in zip(got, sorted(expected)):
        assert abs(g[3] - e[3]) < 1e-12


# ------------------------------------------- balanced shard assignment


def test_shard_assign_balanced_matches_python(spark, sf_dir):
    """LPT round robin re-derived structure-free: canon-tokenize each
    doc in plain Python, sort by (tokens desc, doc_id), deal rank i to
    shard (i-1) % 16 — no window functions, no repartitionByRange, no
    shared SQL. Guards the two-phase distributed rank (range partition
    + local row_number + offset join) against off-by-one rank stitching
    that the declarative oracle, stating the same totals, could miss
    only if it failed identically."""
    from mapreducewordcounting_spark.operators.training_ops import (
        N_SHARDS,
        shard_assign_balanced,
    )

    sized = sorted(
        ((len(canon_tokens(d["text"])), d["doc_id"]) for d in
         load_documents(sf_dir)),
        key=lambda t: (-t[0], t[1]))
    per_shard: dict[int, list[int]] = defaultdict(list)
    for i, (n_tok, _) in enumerate(sized):
        per_shard[i % N_SHARDS].append(n_tok)
    expected = sorted(
        (shard, len(v), sum(v)) for shard, v in per_shard.items())
    got = rows_as_tuples(shard_assign_balanced(spark, sf_dir),
                         ["shard", "n_docs", "sum_tokens"])
    assert got == expected
    # balance property: shard token totals within one max-doc of even
    if sized and expected:
        totals = [t for _, _, t in expected]
        assert max(totals) - min(totals) <= sized[0][0]
