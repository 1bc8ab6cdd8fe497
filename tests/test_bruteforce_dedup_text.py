"""Structure-free brute-force differentials — dedup / text-hashing
family (VERDICT r5 item 4: mirrored-oracle inventory).

Each operator here has a DuckDB oracle that mirrors the Spark
construction (md5 banding, shingle inverted indexes, marker tables
generated from shared strings). These tests recompute the DOCUMENTED
semantics in plain Python (hashlib + dict/Counter loops — no SQL, no
Spark expressions, no shared format strings) on the sf0.001 fixture
and compare against the registry query's collected output. A
transcription error in the shared construction would pass the oracle
gate but fail here.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

from tests.bruteforce_util import (
    canon_tokens,
    distinct_ngrams,
    doc_tokens,
    load_documents,
    round6,
    rows_as_tuples,
    word_ngrams,
)
import pytest

# Deep hardening tier (VERDICT r13 item 2): deselected by default
# so the driver's pytest run finishes in budget; `make test-deep`
# runs it. See pytest.ini.
pytestmark = pytest.mark.deep


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------- minhash


def _minhash_sigs(sf_dir: str) -> dict[int, list[str]]:
    """doc -> 8 minhashes; h_i = min over distinct 3-shingles of
    md5("<i>|<shingle>") (docstring spec of dedup_minhash_det)."""
    sigs = {}
    for doc_id, toks in doc_tokens(sf_dir).items():
        sh = set(word_ngrams(toks, 3))
        if sh:
            sigs[doc_id] = [min(_md5(f"{i}|{s}") for s in sh)
                            for i in range(8)]
    return sigs


def _band_keys(sig: list[str]) -> list[str]:
    """4 bands x 2 rows: band b key = md5(h_{2b} + '|' + h_{2b+1})."""
    return [_md5(f"{sig[2 * b]}|{sig[2 * b + 1]}") for b in range(4)]


def test_minhash_det_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.dedup import dedup_minhash_det

    sigs = _minhash_sigs(sf_dir)
    shared: Counter = Counter()
    by_band: dict[tuple[int, str], list[int]] = defaultdict(list)
    for doc_id, sig in sigs.items():
        for b, key in enumerate(_band_keys(sig)):
            by_band[(b, key)].append(doc_id)
    for docs in by_band.values():
        docs.sort()
        for i, a in enumerate(docs):
            for b in docs[i + 1:]:
                shared[(a, b)] += 1
    expected = sorted((a, b, n) for (a, b), n in shared.items())
    got = rows_as_tuples(dedup_minhash_det(spark, sf_dir),
                         ["id_a", "id_b", "n_shared_bands"])
    assert got == expected


def test_minhash_estimate_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.dedup import (
        dedup_minhash_estimate,
    )

    toks = doc_tokens(sf_dir)
    sh = {d: set(word_ngrams(t, 3)) for d, t in toks.items()}
    sigs = _minhash_sigs(sf_dir)
    cand = set()
    by_band: dict[tuple[int, str], list[int]] = defaultdict(list)
    for doc_id, sig in sigs.items():
        for b, key in enumerate(_band_keys(sig)):
            by_band[(b, key)].append(doc_id)
    for docs in by_band.values():
        docs.sort()
        for i, a in enumerate(docs):
            for b in docs[i + 1:]:
                cand.add((a, b))
    expected = []
    for a, b in sorted(cand):
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / 8.0
        inter = len(sh[a] & sh[b])
        jac = inter / (len(sh[a]) + len(sh[b]) - inter)
        expected.append((a, b, round(est, 6), round(jac, 6)))
    got = rows_as_tuples(dedup_minhash_estimate(spark, sf_dir),
                         ["id_a", "id_b", "est_jaccard", "jaccard"])
    assert [(a, b) for a, b, *_ in got] == [(a, b) for a, b, *_ in expected]
    for g, e in zip(got, expected):
        assert abs(g[2] - e[2]) < 1e-9 and abs(g[3] - e[3]) < 1e-9, (g, e)


# ---------------------------------------------------------------- simhash


def test_simhash_det_matches_python(spark, sf_dir):
    """64-bit token hash = first 16 md5 hex chars (hi 8 / lo 8 as two
    uint32); per-bit +-1 votes over token OCCURRENCES; sig bit = vote
    sum > 0; candidates share any of the four 16-bit chunks; emit
    hamming <= 3 (docstring spec of dedup_simhash_det)."""
    from mapreducewordcounting_spark.operators.dedup import dedup_simhash_det

    sigs = {}
    for doc_id, toks in doc_tokens(sf_dir).items():
        if not toks:
            continue
        votes_hi = [0] * 32
        votes_lo = [0] * 32
        for w in toks:
            h = _md5(w)
            hi, lo = int(h[:8], 16), int(h[8:16], 16)
            for b in range(32):
                votes_hi[b] += 1 if (hi >> b) & 1 else -1
                votes_lo[b] += 1 if (lo >> b) & 1 else -1
        sig_hi = sum(1 << b for b in range(32) if votes_hi[b] > 0)
        sig_lo = sum(1 << b for b in range(32) if votes_lo[b] > 0)
        sigs[doc_id] = (sig_hi, sig_lo)
    ids = sorted(sigs)
    expected = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            (ah, al), (bh, bl) = sigs[a], sigs[b]
            chunks_match = (
                (ah >> 16) == (bh >> 16) or (ah & 0xFFFF) == (bh & 0xFFFF)
                or (al >> 16) == (bl >> 16) or (al & 0xFFFF) == (bl & 0xFFFF))
            if chunks_match:
                ham = bin(ah ^ bh).count("1") + bin(al ^ bl).count("1")
                if ham <= 3:
                    expected.append((a, b, ham))
    got = rows_as_tuples(dedup_simhash_det(spark, sf_dir),
                         ["id_a", "id_b", "hamming"])
    assert got == sorted(expected)


# ------------------------------------------------------- shingle family


def test_containment_pairs_match_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.dedup import (
        dedup_containment_pairs,
    )

    sh = {d: set(word_ngrams(t, 3)) for d, t in doc_tokens(sf_dir).items()}
    sh = {d: s for d, s in sh.items() if s}
    expected = []
    for a, sa in sh.items():
        for b, sb in sh.items():
            if a == b:
                continue
            inter = len(sa & sb)
            if inter and inter / len(sa) >= 0.9:
                expected.append((a, b, round(inter / len(sa), 6)))
    got = rows_as_tuples(dedup_containment_pairs(spark, sf_dir),
                         ["id_a", "id_b", "containment"])
    assert [(a, b) for a, b, _ in got] == [
        (a, b) for a, b, _ in sorted(expected)]
    for g, e in zip(got, sorted(expected)):
        assert abs(g[2] - e[2]) < 1e-9


def test_dup_ngram_coverage_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.text_analysis import (
        text_dup_ngram_coverage,
    )

    sh = {d: set(word_ngrams(t, 3)) for d, t in doc_tokens(sf_dir).items()}
    df: Counter = Counter()
    for s in sh.values():
        df.update(s)
    expected = []
    for d, s in sh.items():
        if not s:
            continue
        n_shared = sum(1 for g in s if df[g] > 1)
        expected.append((d, len(s), n_shared, round(n_shared / len(s), 6)))
    got = rows_as_tuples(text_dup_ngram_coverage(spark, sf_dir),
                         ["doc_id", "n_shingles", "n_shared",
                          "dup_fraction"])
    assert [r[:3] for r in got] == [r[:3] for r in sorted(expected)]
    for g, e in zip(got, sorted(expected)):
        assert abs(g[3] - e[3]) < 1e-9


def test_repetition_signals_match_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.training_ops import (
        text_repetition_signals,
    )

    expected = []
    for d, toks in doc_tokens(sf_dir).items():
        if not toks:
            continue
        cnt = Counter(toks)
        n = len(toks)
        top_frac = max(cnt.values()) / n
        bigrams = word_ngrams(toks, 2)
        dup_big = 0.0 if not bigrams else 1.0 - len(set(bigrams)) / len(bigrams)
        expected.append((d, n, top_frac, dup_big))
    got = rows_as_tuples(text_repetition_signals(spark, sf_dir),
                         ["doc_id", "n_tokens", "top_token_frac",
                          "dup_bigram_frac"])
    assert [r[:2] for r in got] == [r[:2] for r in sorted(expected)]
    for g, e in zip(got, sorted(expected)):
        assert abs(g[2] - e[2]) < 1e-12 and abs(g[3] - e[3]) < 1e-12


def test_contamination_5gram_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.training_ops import (
        contamination_5gram,
    )

    docs = load_documents(sf_dir)
    grams = {d["doc_id"]: (d["source"],
                           set(word_ngrams(canon_tokens(d["text"]), 5)))
             for d in docs}
    bench: set[str] = set()
    for src, g in grams.values():
        if src == "src0":
            bench |= g
    expected = sorted(
        (d, len(g & bench)) for d, (src, g) in grams.items()
        if src != "src0" and g & bench)
    got = rows_as_tuples(contamination_5gram(spark, sf_dir),
                         ["doc_id", "n_shared_5grams"])
    assert got == expected


def test_ngram_jaccard_values_match_python(spark, sf_dir):
    """Exact 3-shingle Jaccard over all pairs at the 0.8 threshold —
    complements test_hypothesis_dedup's prefix-filter-exactness check
    with a value-level differential on the fixture."""
    from mapreducewordcounting_spark.operators.dedup import (
        dedup_ngram_jaccard,
    )

    sh = {d: set(word_ngrams(t, 3)) for d, t in doc_tokens(sf_dir).items()}
    sh = {d: s for d, s in sh.items() if s}
    ids = sorted(sh)
    expected = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sh[a] & sh[b])
            if inter:
                jac = inter / (len(sh[a]) + len(sh[b]) - inter)
                if jac >= 0.8:
                    expected.append((a, b, jac))
    got = rows_as_tuples(dedup_ngram_jaccard(spark, sf_dir),
                         ["id_a", "id_b", "jaccard"])
    assert [r[:2] for r in got] == [r[:2] for r in expected]
    for g, e in zip(got, expected):
        assert abs(g[2] - e[2]) < 1e-12


# ------------------------------------------------- fingerprint / lang-id


def test_text_fingerprint_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.text_analysis import (
        text_fingerprint,
    )

    expected = sorted(
        (d, hashlib.sha256(" ".join(t).encode()).hexdigest())
        for d, t in doc_tokens(sf_dir).items())
    got = rows_as_tuples(text_fingerprint(spark, sf_dir),
                         ["doc_id", "fingerprint"])
    assert got == expected


def test_lang_id_matches_python(spark, sf_dir):
    """Marker-word scoring straight from the spec: count which of the
    three per-language markers appear as space-delimited substrings of
    the RAW text; ties break en > es > de > fr."""
    from mapreducewordcounting_spark.operators.text_analysis import (
        text_lang_id,
    )

    markers = {"en": ["the", "and", "of"], "es": ["el", "la", "los"],
               "de": ["der", "und", "die"], "fr": ["le", "les", "des"]}
    expected = []
    for d in load_documents(sf_dir):
        padded = f" {d['text']} "
        s = {lang: sum(f" {m} " in padded for m in ws)
             for lang, ws in markers.items()}
        if s["en"] >= max(s["es"], s["de"], s["fr"]):
            guess = "en"
        elif s["es"] >= max(s["de"], s["fr"]):
            guess = "es"
        elif s["de"] >= s["fr"]:
            guess = "de"
        else:
            guess = "fr"
        expected.append((d["doc_id"], s["en"], s["es"], s["de"], s["fr"],
                         guess))
    got = rows_as_tuples(text_lang_id(spark, sf_dir),
                         ["doc_id", "s_en", "s_es", "s_de", "s_fr",
                          "lang_guess"])
    assert got == sorted(expected)


# ----------------------------------------------------- n-gram exploders


def test_explode_bigrams_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.udfs import (
        udtf_explode_bigrams,
    )

    expected = sorted(
        (d, bg)
        for d, toks in doc_tokens(sf_dir).items() if d < 50
        for bg in word_ngrams(toks, 2))
    got = rows_as_tuples(udtf_explode_bigrams(spark, sf_dir),
                         ["doc_id", "bigram"])
    assert got == expected


def test_table_udf_trigrams_matches_python(spark, sf_dir):
    from mapreducewordcounting_spark.operators.sql_surface import (
        sql_table_udf_trigrams,
    )

    words = {w for d, toks in doc_tokens(sf_dir).items() if d < 30
             for w in toks}
    grams: Counter = Counter()
    for w in words:
        for i in range(max(len(w) - 2, 0)):
            grams[w[i:i + 3]] += 1
    expected = sorted((g, n) for g, n in grams.items())
    got = rows_as_tuples(sql_table_udf_trigrams(spark, sf_dir),
                         ["g", "n"])
    assert got == expected


# ------------------------------------------------------- repeated spans


def test_repeated_spans_matches_python(spark, sf_dir):
    """dedup_repeated_spans vs a dict/loop sweep: count every 8-token
    window across the corpus, flag windows seen at >1 (doc, pos) site,
    merge overlaps per doc, measure the union. No SQL, no windows —
    the documented ExactSubstr-lite semantics only."""
    from mapreducewordcounting_spark.operators.dedup import (
        REPEAT_SPAN_K,
        dedup_repeated_spans,
    )

    K = REPEAT_SPAN_K
    toks = doc_tokens(sf_dir)
    sites: Counter = Counter()
    for t in toks.values():
        for g in word_ngrams(t, K):
            sites[g] += 1

    expected = []
    for doc_id, t in sorted(toks.items()):
        wins = word_ngrams(t, K)
        if not wins:  # < K tokens: the operator (and oracle) emit no row
            continue
        dup_pos = [i + 1 for i, g in enumerate(wins) if sites[g] > 1]
        n_spans = covered = 0
        prev_end = 0
        for p in dup_pos:
            if p > prev_end:
                n_spans += 1
            covered += max(p + K - max(p, prev_end), 0)
            prev_end = max(prev_end, p + K)
        expected.append((doc_id, len(t), len(wins), len(dup_pos),
                         n_spans, covered,
                         round6(covered / len(t))))

    got = rows_as_tuples(
        dedup_repeated_spans(spark, sf_dir),
        ["doc_id", "n_toks", "n_windows", "n_dup_windows",
         "n_spans", "covered_tokens", "dup_coverage"])
    assert got == expected


# ---------------------------------------------- incremental near-dup gate


def test_incremental_neardup_matches_python(spark, sf_dir):
    """dedup_incremental_neardup vs plain Python: band new docs
    (source != src0) against corpus docs (src0) with the documented
    md5 family, verify candidates with exact set Jaccard, gate at
    0.8. No SQL, no shared format strings."""
    from mapreducewordcounting_spark.operators.dedup import (
        dedup_incremental_neardup,
    )

    docs = load_documents(sf_dir)
    toks = {d["doc_id"]: canon_tokens(d["text"]) for d in docs}
    source = {d["doc_id"]: d["source"] for d in docs}
    sigs = _minhash_sigs(sf_dir)

    by_band: dict[tuple[int, str], dict[str, list[int]]] = defaultdict(
        lambda: {"new": [], "corpus": []})
    for doc_id, sig in sigs.items():
        side = "corpus" if source[doc_id] == "src0" else "new"
        for b, key in enumerate(_band_keys(sig)):
            by_band[(b, key)][side].append(doc_id)

    cand = set()
    for sides in by_band.values():
        for n in sides["new"]:
            for c in sides["corpus"]:
                cand.add((n, c))

    per_new: dict[int, list[float]] = defaultdict(list)
    for n, c in sorted(cand):
        a = set(word_ngrams(toks[n], 3))
        b = set(word_ngrams(toks[c], 3))
        inter = len(a & b)
        per_new[n].append(inter / (len(a) + len(b) - inter))

    expected = sorted(
        (n, len(js), sum(1 for j in js if j >= 0.8),
         round6(max(js)))
        for n, js in per_new.items())
    got = rows_as_tuples(
        dedup_incremental_neardup(spark, sf_dir),
        ["new_id", "n_band_matches", "n_verified", "best_jaccard"])
    assert got == expected


# ------------------------------------------------- contamination spans


def test_contamination_spans_match_python(spark, sf_dir):
    """contamination_span_coverage vs plain Python: benchmark = src0
    docs' 5-gram set; per training doc, flag windows whose exact
    sequence is in the benchmark, merge overlaps, measure the union.
    Every training doc with >= 5 tokens emits a row."""
    from mapreducewordcounting_spark.operators.training_ops import (
        CONTAM_SPAN_K,
        contamination_span_coverage,
    )

    K = CONTAM_SPAN_K
    docs = load_documents(sf_dir)
    toks = {d["doc_id"]: canon_tokens(d["text"]) for d in docs}
    source = {d["doc_id"]: d["source"] for d in docs}
    bench = set()
    for doc_id, t in toks.items():
        if source[doc_id] == "src0":
            bench.update(word_ngrams(t, K))

    expected = []
    for doc_id, t in sorted(toks.items()):
        if source[doc_id] == "src0":
            continue
        wins = word_ngrams(t, K)
        if not wins:
            continue
        hit_pos = [i + 1 for i, g in enumerate(wins) if g in bench]
        n_spans = covered = 0
        prev_end = 0
        for p in hit_pos:
            if p > prev_end:
                n_spans += 1
            covered += max(p + K - max(p, prev_end), 0)
            prev_end = max(prev_end, p + K)
        expected.append((doc_id, len(t), len(wins), len(hit_pos),
                         n_spans, covered, round6(covered / len(t))))

    got = rows_as_tuples(
        contamination_span_coverage(spark, sf_dir),
        ["doc_id", "n_toks", "n_windows", "n_contam_windows",
         "n_spans", "covered_tokens", "contam_coverage"])
    assert got == expected


# ------------------------------------------------- perceptual hash (mm)


def _phash_sig(text: str) -> tuple[int, int, int]:
    """dHash-structured perceptual signature (docstring spec of
    mm_phash_neardup): 65 two-char blocks from the first 130 chars,
    intensity = first 8 md5 hex chars as uint32, bit i = I[i] < I[i+1];
    n_blocks = ceil(len/2) capped at 65."""
    inten = []
    for i in range(65):
        blk = text[i * 2:i * 2 + 2]
        inten.append(int(_md5(blk)[:8], 16))
    lo = sum(1 << i for i in range(32) if inten[i] < inten[i + 1])
    hi = sum(1 << (i - 32) for i in range(32, 64) if inten[i] < inten[i + 1])
    return hi, lo, min((len(text) + 1) // 2, 65)


def _phash_pairs(texts: dict[int, str]) -> list[tuple[int, int, int]]:
    """Candidates = shared ELIGIBLE 16-bit band (band k requires
    16k < n_blocks on BOTH sides); emit hamming <= 3."""
    sigs = {d: _phash_sig(t) for d, t in texts.items()}
    ids = sorted(sigs)
    out = []
    for x, a in enumerate(ids):
        for b in ids[x + 1:]:
            (ah, al, an), (bh, bl, bn) = sigs[a], sigs[b]
            keys_a = (al & 0xFFFF, al >> 16, ah & 0xFFFF, ah >> 16)
            keys_b = (bl & 0xFFFF, bl >> 16, bh & 0xFFFF, bh >> 16)
            if not any(16 * k < an and 16 * k < bn
                       and keys_a[k] == keys_b[k] for k in range(4)):
                continue
            ham = bin(ah ^ bh).count("1") + bin(al ^ bl).count("1")
            if ham <= 3:
                out.append((a, b, ham))
    return sorted(out)


def test_phash_neardup_matches_python(spark, sf_dir):
    """Raw text (the asset payload bytes), NOT canon_tokens — the
    perceptual hash sees the payload exactly as stored."""
    from mapreducewordcounting_spark.operators.multimodal import (
        mm_phash_neardup,
    )

    texts = {d["doc_id"]: d["text"] for d in load_documents(sf_dir)}
    expected = _phash_pairs(texts)
    got = rows_as_tuples(mm_phash_neardup(spark, sf_dir),
                         ["id_a", "id_b", "hamming"])
    assert got == expected
    assert expected, "fixture must keep the threshold non-vacuous"


def test_audio_vad_matches_python(spark, sf_dir):
    """VAD segmentation recomputed structure-free: per audio asset
    (doc_id % 3 == 1), window w's energy is the md5-fold of its
    16-char payload slice mod 1000, voiced iff >= 500, adjacent
    voiced windows merge into segments. Also asserts non-vacuousness:
    both voiced and unvoiced windows exist somewhere in the fixture,
    and some asset has >= 2 segments (the merge actually merges)."""
    from mapreducewordcounting_spark.operators.multimodal import (
        VAD_THRESHOLD,
        VAD_WIN,
        mm_audio_vad_segments,
    )

    expected = []
    any_voiced = any_unvoiced = False
    for d in load_documents(sf_dir):
        if d["doc_id"] % 3 != 1:
            continue
        nw = d["n_chars"] % 30 + 1
        voiced = []
        for w in range(nw):
            sl = d["text"][w * VAD_WIN:(w + 1) * VAD_WIN]
            e = int(hashlib.md5(sl.encode()).hexdigest()[:8], 16) % 1000
            voiced.append(e >= VAD_THRESHOLD)
        any_voiced |= any(voiced)
        any_unvoiced |= not all(voiced)
        segs = []
        run = 0
        for v in voiced + [False]:
            if v:
                run += 1
            elif run:
                segs.append(run)
                run = 0
        expected.append((d["doc_id"], nw, sum(voiced), len(segs),
                         max(segs) if segs else 0,
                         round(sum(voiced) / nw, 6)))
    got = rows_as_tuples(mm_audio_vad_segments(spark, sf_dir),
                         ["asset_id", "n_windows", "n_voiced",
                          "n_segments", "longest_seg", "voiced_ratio"])
    assert got == sorted(expected)
    assert any_voiced and any_unvoiced, "threshold must split classes"
    assert any(n >= 2 for _, _, _, n, _, _ in got), \
        "fixture must exercise multi-segment merge"


def test_scene_cuts_match_python(spark, sf_dir):
    """Shot-boundary detection recomputed structure-free: per video
    asset (doc_id % 3 == 2), frame f signs the 130-char slice of its
    4-frame shot with the dHash-structured md5-fold; a cut is any
    adjacent-frame hamming > 8. Also asserts the piecewise-constant
    decode's invariant directly: intra-shot distances are 0, so every
    reported cut sits on a shot boundary (frame_idx % 4 == 0)."""
    from mapreducewordcounting_spark.operators.multimodal import (
        CUT_HAMMING,
        CUT_WINDOW,
        SCENE_LEN,
        mm_video_scene_cuts,
    )

    expected = []
    for d in load_documents(sf_dir):
        if d["doc_id"] % 3 != 2:
            continue
        n_frames = d["n_chars"] % 30 + 1
        sigs = []
        for f in range(n_frames):
            start = (f // SCENE_LEN) * CUT_WINDOW
            hi, lo, _ = _phash_sig(d["text"][start:start + CUT_WINDOW])
            sigs.append((hi, lo))
        for f in range(1, n_frames):
            h = (bin((sigs[f][0] ^ sigs[f - 1][0])).count("1")
                 + bin((sigs[f][1] ^ sigs[f - 1][1])).count("1"))
            if h > CUT_HAMMING:
                expected.append((d["doc_id"], f, h))
    got = rows_as_tuples(mm_video_scene_cuts(spark, sf_dir),
                         ["asset_id", "frame_idx", "hamming"])
    assert got == sorted(expected)
    assert got, "fixture must keep the cut threshold non-vacuous"
    assert all(f % SCENE_LEN == 0 for _, f, _ in got)


def test_rake_keyphrases_match_python(spark, sf_dir):
    """RAKE recomputed structure-free: stopword-gap segmentation,
    degree/freq word scores over multi-word candidates, phrase score
    = sum of word scores, global top-15 with (score, phrase)
    ordering."""
    from mapreducewordcounting_spark.operators.text_analysis import (
        RAKE_TOP_K,
        STOPWORDS,
        text_keyphrases_rake,
    )

    stop = set(STOPWORDS)
    phrases: list[list[str]] = []
    for toks in doc_tokens(sf_dir).values():
        run: list[str] = []
        for w in toks + ["the"]:  # sentinel flushes the last run
            if w in stop:
                if len(run) >= 2:
                    phrases.append(run)
                run = []
            else:
                run.append(w)
    freq: Counter = Counter()
    degree: Counter = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            degree[w] += len(p)
    by_text: dict[str, list[list[str]]] = defaultdict(list)
    for p in phrases:
        by_text[" ".join(p)].append(p)
    rows = []
    for text, occs in by_text.items():
        raw = round6(sum(degree[w] / freq[w]
                         for p in occs for w in p))
        rows.append((" ".join(occs[0]), len(occs[0]), len(occs),
                     round6(raw / len(occs))))
    rows.sort(key=lambda r: (-r[3], r[0]))
    expected = sorted(rows[:RAKE_TOP_K])
    got = rows_as_tuples(
        text_keyphrases_rake(spark, sf_dir),
        ["phrase", "n_words", "n_occurrences", "rake_score"])
    assert got == expected


def test_url_canonical_matches_python(spark, sf_dir):
    """URL synthesis + canonicalization recomputed structure-free with
    str ops (no regex), asserting the documented rules directly."""
    from mapreducewordcounting_spark.operators.dedup import (
        dedup_url_canonical,
    )

    groups: dict[str, list[int]] = defaultdict(list)
    for d in load_documents(sf_dir):
        i = d["doc_id"]
        url = (("HTTPS://WWW" if i % 2 == 0 else "https://www")
               + ".Example.COM/d/" + str(i // 21) + "/"
               + ("?utm_source=feed&utm_campaign=x" if i % 3 == 0 else "")
               + ("#frag" if i % 5 == 0 else ""))
        c = url.lower()
        c = c.split("#", 1)[0]
        if "?utm_" in c and c.endswith(c[c.index("?utm_"):]):
            c = c[:c.index("?utm_")]
        c = c.rstrip("/")
        groups[c].append(i)
    expected = sorted((c, min(ids), len(ids))
                      for c, ids in groups.items() if len(ids) > 1)
    got = rows_as_tuples(dedup_url_canonical(spark, sf_dir),
                         ["curl", "survivor_id", "n_copies"])
    assert got == expected
    assert got, "dup groups must be non-vacuous"


def test_boilerplate_lines_match_python(spark, sf_dir):
    """Line synthesis + df threshold recomputed structure-free with
    plain dict counting (no SQL, no windows), asserting the documented
    boilerplate rule (>= 3 docs AND > half the source) directly."""
    from mapreducewordcounting_spark.operators.text_analysis import (
        BOILER_FRAC,
        BOILER_LINE_LEN,
        BOILER_MIN_DF,
        text_boilerplate_lines,
    )

    doc_lines: dict[int, list[str]] = {}
    doc_src: dict[int, str] = {}
    for d in load_documents(sf_dir):
        toks = canon_tokens(d["text"])
        lines = [" ".join(toks[i:i + BOILER_LINE_LEN])
                 for i in range(0, len(toks), BOILER_LINE_LEN)]
        lines.append("nav home about " + d["source"])
        lines.append("subscribe footer links " + d["source"])
        doc_lines[d["doc_id"]] = lines
        doc_src[d["doc_id"]] = d["source"]
    src_docs: dict[str, set] = defaultdict(set)
    df_docs: dict[tuple, set] = defaultdict(set)
    for i, lines in doc_lines.items():
        src_docs[doc_src[i]].add(i)
        for ln in lines:
            df_docs[(doc_src[i], ln)].add(i)
    boiler = {k for k, docs in df_docs.items()
              if len(docs) >= BOILER_MIN_DF
              and len(docs) > BOILER_FRAC * len(src_docs[k[0]])}
    expected = []
    for i, lines in doc_lines.items():
        flags = [(doc_src[i], ln) in boiler for ln in lines]
        total = sum(len(ln.split(" ")) for ln in lines)
        kept = sum(len(ln.split(" ")) for ln, b in zip(lines, flags)
                   if not b)
        expected.append((i, len(lines), sum(flags), round6(kept / total)))
    got = rows_as_tuples(
        text_boilerplate_lines(spark, sf_dir),
        ["doc_id", "n_lines", "n_boiler", "kept_token_ratio"])
    assert got == sorted(expected)
    assert any(r[2] > 2 for r in got) or all(r[2] == 2 for r in got)
    # header+footer must always be flagged (df = whole source)
    assert all(r[2] >= 2 for r in got)


def test_paragraph_exact_matches_python(spark, sf_dir):
    """Fixed-grain slicing + global keep-first recomputed with a plain
    first-seen dict over (doc_id, para_idx) order."""
    from mapreducewordcounting_spark.operators.dedup import (
        PARA_LEN,
        dedup_paragraph_exact,
    )

    paras = []  # (doc_id, idx, para)
    for d in sorted(load_documents(sf_dir), key=lambda d: d["doc_id"]):
        toks = canon_tokens(d["text"])
        for j, i in enumerate(range(0, len(toks), PARA_LEN)):
            paras.append((d["doc_id"], j,
                          " ".join(toks[i:i + PARA_LEN])))
    first: dict[str, tuple] = {}
    for doc, idx, p in sorted(paras):
        first.setdefault(p, (doc, idx))
    per_doc: dict[int, list] = defaultdict(lambda: [0, 0, 0, 0])
    for doc, idx, p in paras:
        s = per_doc[doc]
        nt = len(p.split(" "))
        s[0] += 1
        s[3] += nt
        if first[p] == (doc, idx):
            s[2] += nt
        else:
            s[1] += 1
    expected = sorted(
        (doc, s[0], s[1], round6(s[2] / s[3]))
        for doc, s in per_doc.items())
    got = rows_as_tuples(
        dedup_paragraph_exact(spark, sf_dir),
        ["doc_id", "n_paras", "n_dropped", "retained_token_ratio"])
    assert got == expected
    assert sum(r[2] for r in got) > 0, "drops must be non-vacuous"
