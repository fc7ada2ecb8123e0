"""Operator tests: trigram LM scoring, fuzzy blocked join, MAD outliers."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from es_ch_sync_spark.operators.analytics import mad_outliers
from es_ch_sync_spark.operators.text import fuzzy_duplicate_pairs, trigram_lm_score


def test_trigram_lm_handchecked(spark):
    """Two docs, one shared pattern: verify the exact smoothed
    cross-entropy for a doc whose trigrams all occur twice."""
    docs = spark.createDataFrame(
        [(1, "abcd"), (2, "abcd")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in trigram_lm_score(docs).collect()}
    # trigrams per doc: abc, bcd → model counts: each 2; N=4, V=2.
    # p = (2+1)/(4+2) = 0.5 → xent = -ln(0.5)
    expect = round(-math.log(0.5), 4)
    assert rows[1]["n_tri"] == 2
    assert rows[1]["xent"] == expect == rows[2]["xent"]


def test_trigram_lm_rare_doc_scores_worse(spark):
    """A doc made of corpus-rare trigrams gets higher cross-entropy than a
    doc made of the corpus-dominant pattern."""
    common = [(i, "the cat sat on the mat") for i in range(20)]
    docs = spark.createDataFrame(
        common + [(100, "zqxj wvkp qzzx")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r["xent"] for r in trigram_lm_score(docs).collect()}
    assert rows[100] > rows[0]


def test_trigram_short_text_empty(spark):
    """len<3 docs produce no trigram rows (and no descending-sequence
    blowup from Spark's sequence())."""
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "abcdef")], "doc_id long, text string"
    )
    assert [r["doc_id"] for r in trigram_lm_score(docs).collect()] == [2]


def test_fuzzy_pairs_match_and_reject(spark):
    docs = spark.createDataFrame(
        [
            (1, "en", "The quick brown fox jumps over the lazy dog tonight"),
            (2, "en", "The quick brown fox jumps over the lazy cat tonight"),
            (3, "en", "A completely different sentence about something else"),
            (4, "de", "The quick brown fox jumps over the lazy dog tonight"),
        ],
        "doc_id long, lang string, text string",
    )
    got = {(r["id_a"], r["id_b"]) for r in fuzzy_duplicate_pairs(docs).collect()}
    # 1-2 share prefix+lang and differ by one word; 4 shares text with 1
    # but is blocked away by lang.
    assert got == {(1, 2)}


def test_mad_outliers_planted(spark):
    rows = [(i, "a", 10.0 + (i % 3)) for i in range(30)] + [(99, "a", 500.0)]
    # constant group: MAD = 0 → excluded entirely
    rows += [(200 + i, "b", 7.0) for i in range(10)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = mad_outliers(df, "value", ["event_type"], ["event_id"]).collect()
    assert [r["event_id"] for r in got] == [99]
    assert got[0]["score"] > 3.0


# ---------------------------------------------------------------------------
# BPE tokenizer training
# ---------------------------------------------------------------------------

def test_bpe_merge_pair_greedy_overlap(spark):
    """Greedy left-to-right application on overlapping runs: 'aaaa' under
    (a,a) must become [aa, aa], 'aaab' → [aa, a, b]."""
    from pyspark.sql import functions as F

    from es_ch_sync_spark.operators.text import _merge_pair

    df = spark.createDataFrame([("aaaa",), ("aaab",)], "w string")
    out = df.select(
        "w", _merge_pair(F.split("w", ""), "a", "a").alias("m")
    ).collect()
    got = {r["w"]: r["m"] for r in out}
    assert got["aaaa"] == ["aa", "aa"]
    assert got["aaab"] == ["aa", "a", "b"]


def test_bpe_train_matches_reference_python(spark):
    """The distributed trainer must equal a straightforward single-process
    BPE reference on the same tiny corpus (ranks, pairs, counts)."""
    corpus = ["low low low lower lowest", "new newer newest low", "wider new"]

    # reference implementation (pure python, word-frequency BPE)
    from collections import Counter

    wc = Counter(w for line in corpus for w in line.lower().split())
    vocab = {w: list(w) for w in wc}
    expected = []
    for rank in range(1, 6):
        pc: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        # max count, ties lexicographic
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((rank, a, b, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out

    from es_ch_sync_spark.operators.text import bpe_train

    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = [
        (m["rank"], m["left"], m["right"], m["pair_count"])
        for m in bpe_train(docs, n_merges=5)
    ]
    assert got == expected


def test_bpe_apply_roundtrips_training_state(spark):
    """Encoding the training corpus with the learned merges must
    reproduce tokens whose concatenation restores each word."""
    from pyspark.sql import functions as F

    from es_ch_sync_spark.operators.text import (
        bpe_apply,
        bpe_train,
        bpe_word_counts,
    )

    docs = spark.createDataFrame(
        [("the cat sat on the mat",), ("the cat ran",)], "text string"
    )
    merges = bpe_train(docs, n_merges=4)
    assert len(merges) == 4
    wc = bpe_word_counts(docs).withColumn("syms", F.split("word", ""))
    enc = wc.select(
        "word", bpe_apply(F.col("syms"), merges).alias("toks")
    ).collect()
    for r in enc:
        assert "".join(r["toks"]) == r["word"]


def test_quality_lr_training_moves_weights_and_is_deterministic(spark, sf_dir):
    """3 GD iterations must move the decision away from the w=0 start
    (where every score is exactly 0.5) and produce identical output on a
    re-run — the bit-stability contract the oracle chain relies on."""
    from pyspark.sql import functions as F

    from es_ch_sync_spark.operators.text import quality_lr_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quality_lr_scores(docs, label=F.col("lang") == "en", iters=3)
    rows = out.collect()
    assert len(rows) == docs.filter(F.col("text").isNotNull()).count()
    assert all(0.0 <= r["p_quality"] <= 1.0 for r in rows)
    # trained: scores are not the untrained constant 0.5
    assert any(abs(r["p_quality"] - 0.5) > 1e-3 for r in rows)
    again = quality_lr_scores(docs, label=F.col("lang") == "en", iters=3)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


def test_wordpiece_longest_match_and_fallback(spark):
    """Greedy longest-match-first: at each cursor the longest vocab
    substring wins; characters outside the multi-char vocab fall back to
    single-char tokens (the alphabet is always in a wordpiece_vocab)."""
    from es_ch_sync_spark.operators.text import wordpiece_encode

    df = spark.createDataFrame(
        [("unhappy",), ("zzgo",), ("a",)], "word string"
    )
    vocab = ["un", "happy", "happ", "go", "a", "h", "n", "p", "u", "y", "z", "g", "o"]
    got = {
        r["word"]: list(r["toks"])
        for r in df.select(
            "word", wordpiece_encode(F.col("word"), vocab).alias("toks")
        ).collect()
    }
    assert got["unhappy"] == ["un", "happy"]  # happy beats happ
    assert got["zzgo"] == ["z", "z", "go"]  # char fallback then longest
    assert got["a"] == ["a"]


def test_wordpiece_vocab_contains_alphabet(spark, sf_dir):
    """Every single character of the corpus is in the vocab (no
    dead-ends), and the multi-char tail respects the top-V cut."""
    from es_ch_sync_spark.operators.text import (
        bpe_word_counts,
        wordpiece_vocab,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v = wordpiece_vocab(docs, vocab_size=50)
    toks = {r["tok"] for r in v.collect()}
    chars = {
        c
        for r in bpe_word_counts(docs).select("word").collect()
        for c in r["word"]
    }
    assert chars <= toks
    assert sum(1 for t in toks if len(t) >= 2) == 50


def test_nb_separable_corpus_and_unseen_tokens(spark):
    """On a cleanly separable corpus NB recovers the labels; a doc of
    never-seen tokens falls back to the unseen cell + prior (majority
    class wins)."""
    from pyspark.sql import functions as F

    from es_ch_sync_spark.operators.text import nb_classify, nb_train

    rows = [
        (1, "spam spam buy pills now", "spam"),
        (2, "buy spam pills cheap now", "spam"),
        (3, "meeting notes agenda minutes", "ham"),
        (4, "agenda for the meeting notes", "ham"),
        (5, "pills spam buy", "spam"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model, priors = nb_train(docs, label_col="lang")
    pred = {r["doc_id"]: r["pred_label"] for r in nb_classify(docs, model, priors).collect()}
    assert pred == {1: "spam", 2: "spam", 3: "ham", 4: "ham", 5: "spam"}

    new = spark.createDataFrame([(9, "zzz qqq www")], "doc_id long, text string")
    got = nb_classify(new, model, priors).collect()[0]
    # all tokens unseen: score = 3·unseen_m + prior.  ham's smaller
    # corpus (T_l=8 vs 14) makes its unseen cell ln(1/(T_l+V)) LARGER by
    # 3·ln(22/16) ≈ 0.96, beating spam's prior edge ln(3/2) ≈ 0.41
    assert got["pred_label"] == "ham"


def test_phrase_match_positions_and_overlaps(spark):
    """Adjacent-position joins: 'a b a' in 'a b a b a' matches twice
    (overlapping occurrences count); phrase absent → no row; postings
    positions are 0-based over normalized tokens."""
    from es_ch_sync_spark.operators.text import build_postings, phrase_match

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a  B a"), (3, "b b b")],
        "doc_id long, text string",
    )
    post = build_postings(docs)
    assert post.filter("id = 2").orderBy("pos").collect()[1]["tok"] == "b"
    got = {r["id"]: r["n_matches"] for r in phrase_match(post, ["a", "b", "a"]).collect()}
    assert got == {1: 2, 2: 1}


def test_unigram_viterbi_is_max_likelihood_not_greedy(spark):
    """Discriminates Viterbi from longest-match-first: under
    a=-1, bc=-1, ab=-10, c=-10 the greedy segmentation of 'abc' is
    [ab, c] (score -20) but the max-likelihood one is [a, bc] (-2).
    Ties prefer the longer piece (packed (score, len) argmax)."""
    from pyspark.sql import functions as F

    from es_ch_sync_spark.operators.text import unigram_viterbi_tokens

    toks = ["a", "b", "c", "ab", "bc"]
    lps = [-1, -5, -10, -10, -1]
    df = spark.createDataFrame([("abc",), ("bb",), ("q",)], "w string")
    got = {
        r["w"]: r["t"]
        for r in df.select(
            "w", unigram_viterbi_tokens(F.col("w"), toks, lps).alias("t")
        ).collect()
    }
    assert got["abc"] == ["a", "bc"]
    assert got["bb"] == ["b", "b"]
    assert got["q"] == ["q"]  # out-of-vocab char still segments (UNK cost)


def test_unigram_train_keeps_alphabet_and_probabilities_sum(spark):
    """The trained vocab always contains the corpus's full alphabet
    (smoothed usage >= 1), every multi-char piece has usage >= 1, and
    log-probs are negative micro-units."""
    from es_ch_sync_spark.operators.text import unigram_train

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * 3) for i in range(4)],
        "doc_id long, text string",
    )
    v = unigram_train(docs, vocab_size=10, em_rounds=2).collect()
    toks = {r["tok"] for r in v}
    for ch in "thecasonm ":
        if ch.strip():
            assert ch in toks, ch
    assert all(r["usage"] >= 1 for r in v)
    assert all(r["logp_m"] < 0 for r in v)


def test_source_jsd_bounds(spark):
    """Identical distributions -> JSD 0; disjoint vocabularies -> ln 2;
    single-source corpus -> NULL (no rest-of-corpus)."""
    import math

    from es_ch_sync_spark.operators.text import source_jsd

    same = spark.createDataFrame(
        [("a", "x y z"), ("b", "x y z")], "source string, text string"
    )
    got = {r["source"]: r["jsd_nats"] for r in source_jsd(same).collect()}
    assert got["a"] == 0.0 and got["b"] == 0.0

    disjoint = spark.createDataFrame(
        [("a", "x x y"), ("b", "p q q")], "source string, text string"
    )
    got = {r["source"]: r["jsd_nats"] for r in source_jsd(disjoint).collect()}
    assert abs(got["a"] - math.log(2)) < 1e-6
    assert abs(got["b"] - math.log(2)) < 1e-6

    solo = spark.createDataFrame([("a", "x y")], "source string, text string")
    assert source_jsd(solo).collect()[0]["jsd_nats"] is None


def test_unigram_train_empty_corpus(spark):
    """An empty (or all-whitespace) corpus trains to an empty model —
    zero rows with the right schema, never a float(None) crash — and the
    empty model still segments (UNK-costed)."""
    from pyspark.sql import functions as F

    from es_ch_sync_spark.operators.text import unigram_train, unigram_viterbi_tokens

    empty = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
    v = unigram_train(empty, vocab_size=10, em_rounds=1)
    assert v.count() == 0
    assert set(v.columns) == {"tok", "usage", "logp_m"}
    df = spark.createDataFrame([("ab",)], "w string")
    got = df.select(unigram_viterbi_tokens(F.col("w"), [], []).alias("t")).collect()
    # uniform UNK cost: Viterbi minimizes piece count -> one 2-char piece
    assert got[0]["t"] == ["ab"]


def test_script_ratios_pins(spark):
    """Pin script_ratios' contract (r9 post-gate registration, VERDICT
    r10 #3): pure-Latin doc → latin_ratio 1.0 and every other class 0;
    empty doc → n_chars 0 with ALL ratios NULL (never 0/0); a CJK+Latin
    mix counts each class exactly; a non-BMP emoji is ONE codepoint in
    n_chars that no BMP class pattern claims, so it lands in other_ratio
    (the documented BMP-codepoint contract)."""
    from es_ch_sync_spark.operators.text import script_ratios

    docs = spark.createDataFrame(
        [
            (1, "Latin"),
            (2, ""),
            (3, "ab 中文 12"),  # 2 latin, 2 CJK, 2 digit, 2 space
            (4, "hi\U0001f600"),        # 2 latin + 1 non-BMP emoji
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in script_ratios(docs).collect()}
    r1 = rows[1]
    assert r1["latin_ratio"] == 1.0
    for c in ("digit", "cjk", "cyrillic", "space", "other"):
        assert r1[f"{c}_ratio"] == 0.0
    r2 = rows[2]
    assert r2["n_chars"] == 0
    for c in ("latin", "digit", "cjk", "cyrillic", "space", "other"):
        assert r2[f"{c}_ratio"] is None
    r3 = rows[3]
    assert r3["n_chars"] == 8
    assert r3["latin_ratio"] == 0.25 and r3["cjk_ratio"] == 0.25
    assert r3["digit_ratio"] == 0.25 and r3["space_ratio"] == 0.25
    assert r3["other_ratio"] == 0.0
    r4 = rows[4]
    assert r4["n_chars"] == 3  # the emoji is one codepoint, not two units
    assert r4["latin_ratio"] == round(2 / 3, 6)
    assert r4["other_ratio"] == round(1 / 3, 6)


def test_doc_perplexity_buckets_laws(spark):
    """Pin the CCNet-bucket laws: a doc copied verbatim from the reference
    corpus scores lower xent than fluent-but-unseen text, which scores
    lower than an OOV-only doc (the add-one floor via the LEFT join —
    never NULL, VERDICT r10 #4's degenerate case); with three distinct
    scores the terciles assign exactly one head/middle/tail; a doc under
    3 normalized chars has no trigrams and is not scored."""
    from es_ch_sync_spark.operators.text import doc_perplexity_buckets

    ref = spark.createDataFrame(
        [(100 + i, "the quick brown fox jumps over the lazy dog") for i in range(4)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),   # verbatim ref prefix: best xent
            (2, "the brown dog jumps"),   # ref words, unseen joins
            (3, "zzqqxxww"),              # pure OOV: add-one floor, worst
            (4, "ab"),                    # < 3 chars: unscored
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in doc_perplexity_buckets(docs, ref=ref).collect()}
    assert set(rows) == {1, 2, 3}  # doc 4 has no trigrams
    assert rows[1]["xent"] < rows[2]["xent"] < rows[3]["xent"]
    assert rows[3]["xent"] is not None  # OOV floor, never NULL
    assert rows[1]["bucket"] == "head"
    assert rows[2]["bucket"] == "middle"
    assert rows[3]["bucket"] == "tail"
    # self-trained default: every doc with >= 1 trigram is scored; ties
    # at a cutoff share its bucket (documented), so with 3 docs the
    # middle tier may be empty — but best is always head, worst tail
    self_rows = sorted(doc_perplexity_buckets(docs).collect(), key=lambda r: r["xent"])
    assert {r["doc_id"] for r in self_rows} == {1, 2, 3}
    assert self_rows[0]["bucket"] == "head"
    assert self_rows[-1]["bucket"] == "tail"


def test_unigram_viterbi_envelope_guard(spark):
    """r9 ADVICE #3: a word past UNIGRAM_MAX_WORD_LEN would overflow the
    packed-score envelope (the sentinel would win the greatest() and
    backtracking would emit garbage) — it must come back UNSEGMENTED as
    a single token, while in-envelope words segment normally."""
    from es_ch_sync_spark.operators.text import (
        UNIGRAM_MAX_WORD_LEN,
        unigram_viterbi_tokens,
    )

    long_word = "z" * (UNIGRAM_MAX_WORD_LEN + 50)  # all-UNK base64-blob shape
    df = spark.createDataFrame([("ab",), (long_word,)], "word string")
    toks, logps = ["a", "b", "ab"], [-100, -200, -50]
    out = {
        r["word"]: r["t"]
        for r in df.select(
            "word", unigram_viterbi_tokens(F.col("word"), toks, logps).alias("t")
        ).collect()
    }
    assert out["ab"] == ["ab"]  # ML segmentation still runs in-envelope
    assert out[long_word] == [long_word]  # passthrough, not garbage
    # boundary: exactly at the limit still segments exactly
    edge = "a" * UNIGRAM_MAX_WORD_LEN
    got = (
        spark.createDataFrame([(edge,)], "word string")
        .select(unigram_viterbi_tokens(F.col("word"), toks, logps).alias("t"))
        .collect()[0]["t"]
    )
    assert got == ["a"] * UNIGRAM_MAX_WORD_LEN


def test_zipf_fit_exact_power_law(spark):
    """A corpus planted as an exact power law freq(rank) = C·rank^s must
    recover slope ≈ s with r² ≈ 1; a 2-word corpus (degenerate but
    den > 0) still emits a finite fit."""
    from es_ch_sync_spark.operators.text import zipf_fit

    # freq = 1000 * rank^-1 for ranks 1..8, realized as repeated words
    rows = []
    for rk in range(1, 9):
        freq = round(1000 / rk)
        rows.extend([(f"w{rk:02d}",)] * freq)
    docs = spark.createDataFrame(
        [(" ".join(w for (w,) in rows),)], "text string"
    )
    r = zipf_fit(docs, top_ranks=8).collect()[0]
    assert r["n_ranks"] == 8
    assert abs(r["slope"] - (-1.0)) < 0.01  # rounding of round(1000/rk)
    assert r["r2"] > 0.999
    # intercept_ln ≈ ln(1000)
    import math

    assert abs(r["intercept_ln"] - math.log(1000)) < 0.02


def test_good_turing_laws(spark):
    """Planted shingle spectrum: docs built so the 3-shingle census has
    known N_r values; pin p0 = N1/N, r* = (r+1)N_{r+1}/N_r, and the
    missing-row contract for spectrum gaps."""
    from es_ch_sync_spark.operators.text import good_turing_unseen

    # 3-word docs each contribute exactly ONE 3-shingle; repeat doc
    # texts to plant counts: 3 shingles once, 1 shingle twice
    texts = ["a b c", "d e f", "g h i"] + ["x y z"] * 2
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = {r["r"]: r for r in good_turing_unseen(docs, k=3, max_r=5).collect()}
    # census: N1 = 3, N2 = 1, N = 5 occurrences, 4 types
    assert rows[0]["r_star"] == round(3 / 5, 6)  # p0 = N1/N
    assert rows[0]["n_tokens"] == 5 and rows[0]["n_types"] == 4
    assert rows[1]["n_r"] == 3 and rows[1]["n_r_plus_1"] == 1
    assert rows[1]["r_star"] == round(2 * 1 / 3, 6)
    assert rows[2]["n_r"] == 1 and rows[2]["n_r_plus_1"] == 0
    assert rows[2]["r_star"] == 0.0  # gap above: N3 = 0
    assert set(rows) == {0, 1, 2}  # r = 3..5 absent from the census
    # short doc contributes its single joined form
    short = spark.createDataFrame([("one two",)], "text string")
    srows = good_turing_unseen(short, k=3).collect()
    assert {r["r"] for r in srows} == {0, 1}


def test_gopher_quality_flags_rules(spark):
    """Planted docs hit each Gopher rule exactly: a fluent 60-word doc
    passes; a 5-word doc fails the count floor; a symbol-soup doc fails
    the #/ellipsis ratio; a no-stopword doc fails the probe; a numeric
    doc fails the alpha fraction; the no-explode mean-word-length
    identity is hand-checked."""
    from es_ch_sync_spark.operators.text import gopher_quality_flags

    fluent = " ".join(
        ["the quick brown fox jumps over the lazy dog and that have with be to of"]
        * 5
    )  # 75 words, all rules pass
    docs = spark.createDataFrame(
        [
            (1, fluent),
            (2, "too short to pass here"),
            (3, " ".join(["### ... ###"] * 30 + ["the of and that be"])),
            (4, " ".join(["lorem ipsum dolor sit amet"] * 12)),  # no stopwords
            (5, " ".join(["12345 67890"] * 30 + ["the of and that"])),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in gopher_quality_flags(docs).collect()}
    assert got[1]["passes"] is True
    assert got[2]["ok_word_count"] is False and got[2]["passes"] is False
    assert got[3]["ok_symbols"] is False and got[3]["passes"] is False
    assert got[4]["ok_stopwords"] is False and got[4]["passes"] is False
    assert got[5]["ok_alpha"] is False and got[5]["passes"] is False
    # mean word length identity: doc 2 = (len - (n-1)) / n over 'too
    # short to pass here' = (18) / 5
    assert got[2]["mean_word_len"] == round(18 / 5, 6)


def test_heaps_law_fit_extremes(spark):
    """All-new-words corpus: V = N at every checkpoint → β = 1, r² = 1,
    ln_k = 0.  All-identical corpus: V saturates after the first
    checkpoint → β near 0.  Empty corpus → empty frame."""
    from es_ch_sync_spark.operators.text import heaps_law_fit

    fresh = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c") for i in range(10)],
        "doc_id long, text string",
    )
    r = heaps_law_fit(fresh, checkpoints=10).collect()[0]
    assert r["n_checkpoints"] == 10
    assert r["beta"] == 1.0 and r["r2"] == 1.0 and r["ln_k"] == 0.0
    same = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(10)],
        "doc_id long, text string",
    )
    r2 = heaps_law_fit(same, checkpoints=10).collect()[0]
    assert abs(r2["beta"]) < 0.05  # vocabulary stopped growing
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert heaps_law_fit(empty).count() == 0


def test_c4_line_filters_rules(spark):
    """Planted pages hit each C4 rule: a clean 3-sentence page survives
    with all lines; a no-terminal-punctuation line and a short line and
    a javascript line are dropped from clean_text; lorem-ipsum and
    curly-brace pages are dropped wholesale even with good lines."""
    from es_ch_sync_spark.operators.text import c4_line_filters

    good = "This is a fine sentence.\nAnother good line here!\nA third one?"
    mixed = (
        "This line is kept properly.\nno punctuation here\nShort one.\n"
        "Please enable javascript to continue.\nAnd a final good line.\n"
        "Last valid sentence stands."
    )
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, mixed),
            (3, "Lorem ipsum dolor sit amet.\nGood line follows here.\nMore text here now.\nAnd again a line."),
            (4, "if (x) { return y; }\nGood sentence one.\nGood sentence two.\nGood sentence three."),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in c4_line_filters(docs).collect()}
    g = got[1]
    assert g["n_lines"] == 3 and g["n_kept_lines"] == 3 and g["keep_page"] is True
    assert g["clean_text"] == good
    m = got[2]
    # kept: line 1, line 5, line 6 ('Short one.' has < 3 words,
    # 'no punctuation here' lacks terminal punct, javascript dropped)
    assert m["n_lines"] == 6 and m["n_kept_lines"] == 3
    assert "javascript" not in m["clean_text"]
    assert m["keep_page"] is True
    assert got[3]["has_lorem_ipsum"] is True and got[3]["keep_page"] is False
    assert got[4]["has_brace"] is True and got[4]["keep_page"] is False


def test_tokenizer_compression_hand_counts(spark):
    """Hand-counted per-source census: bytes (UTF-8 — the accented char
    counts 2), whitespace tokens, BPE-ish tokens; rate NULL when a
    source has zero tokens of a kind."""
    from es_ch_sync_spark.operators.text import tokenizer_compression

    docs = spark.createDataFrame(
        [(1, "héllo world", "a"), (2, "a-b", "a"), (3, "", "b")],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in tokenizer_compression(docs).collect()}
    a = got["a"]
    # bytes: 'héllo world' = 12 (é is 2), 'a-b' = 3
    assert a["n_bytes"] == 15
    assert a["n_ws_tokens"] == 3  # hello, world, a-b
    # 'héllo' splits h | é | llo (é is outside [A-Za-z]), + world, a, -, b
    assert a["n_bpe_tokens"] == 7
    assert a["bytes_per_ws_token"] == 5.0
    assert a["bytes_per_bpe_token"] == round(15 / 7, 6)
    b = got["b"]
    assert b["n_bytes"] == 0 and b["n_bpe_tokens"] == 0
    assert b["bytes_per_bpe_token"] is None


def test_kneser_ney_bigram_hand_computed(spark):
    """Corpus 'a b a b': census (a,b):2, (b,a):1 -> P(b|a) = 13/16,
    P(a|b) = 5/8; H = (2*(lnm16-lnm13) + (lnm8-lnm5)) / 3e6."""
    import math

    from es_ch_sync_spark.operators.text import kneser_ney_bigram

    docs = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    r = kneser_ney_bigram(docs).collect()[0]
    assert (r["n_bigrams"], r["v_types"]) == (3, 2)
    lnm = lambda x: round(math.log(x) * 1e6)
    s = 2 * (lnm(16) - lnm(13)) + (lnm(8) - lnm(5))
    h = s / 3e6
    assert r["h_kn"] == round(h, 6)
    assert r["ppl_kn"] == round(math.exp(h), 6)
