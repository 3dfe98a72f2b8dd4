"""Token chunking + sequence packing (operators/chunking.py)."""

from pyspark.sql import functions as F

from pcrawler_spark.operators.chunking import pack_sequences, token_chunks


def test_token_chunks_exact(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens, k=4 → 4+4+2
         (2, "one"),
         (3, "")],
        "doc_id long, text string",
    )
    out = sorted(
        (r["doc_id"], r["chunk_id"], r["chunk_text"], r["n_chunk_tokens"])
        for r in token_chunks(docs, chunk_size=4).collect()
    )
    assert out == [
        (1, 0, "t0 t1 t2 t3", 4),
        (1, 1, "t4 t5 t6 t7", 4),
        (1, 2, "t8 t9", 2),
        (2, 0, "one", 1),
        (3, 0, "", 1),  # SQL string_split('') → [''] — one empty token
    ]
    # reassembling the chunks reproduces the document
    joined = (
        token_chunks(docs, chunk_size=4)
        .groupBy("doc_id")
        .agg(F.array_join(F.array_sort(F.collect_list(
            F.struct("chunk_id", "chunk_text"))).getField("chunk_text"), " ").alias("t"))
    )
    back = {r["doc_id"]: r["t"] for r in joined.collect()}
    assert back[1] == " ".join(f"t{i}" for i in range(10))


def test_pack_sequences_bins(spark):
    # single shard (n_shards=1): deterministic running-total bins
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in enumerate([100, 100, 100, 400, 50, 600, 10])],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bin"] for r in pack_sequences(docs, budget=256, n_shards=1).collect()}
    # running totals before each doc: 0,100,200,300,700,750,1350
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 2, 5: 2, 6: 5}


def test_pack_sequences_sharding(spark):
    docs = spark.createDataFrame(
        [(i, "w w w") for i in range(16)], "doc_id long, text string"
    )
    out = pack_sequences(docs, budget=6, n_shards=4).collect()
    assert {r["shard"] for r in out} == {0, 1, 2, 3}
    # within a shard: 3 tokens each, budget 6 → two docs per bin
    for shard in range(4):
        bins = [r["bin"] for r in sorted(out, key=lambda r: r["doc_id"]) if r["shard"] == shard]
        assert bins == [0, 0, 1, 1]


def test_logfreq_and_repetition_semantics(spark):
    from pcrawler_spark.operators.textstats import repetition_ratio, token_logfreq_score

    docs = spark.createDataFrame(
        [(1, "the the the the"),           # one token 4×: df high, repetition max
         (2, "alpha beta gamma delta"),     # all unique: rare tokens, no repetition
         (3, "the beta the beta the beta")],
        "doc_id long, text string",
    )
    rep = {r["doc_id"]: r for r in repetition_ratio(docs, n=3).collect()}
    # doc1: shingles 'the the the' ×2 → 2 raw, 1 distinct → 500000 ppm
    assert rep[1]["n_shingles"] == 2 and rep[1]["dup_ratio_ppm"] == 500000
    # doc2: 2 raw shingles, both distinct → 0
    assert rep[2]["dup_ratio_ppm"] == 0
    # doc3: 4 raw shingles, 2 distinct → 500000
    assert rep[3]["n_shingles"] == 4 and rep[3]["dup_ratio_ppm"] == 500000

    lf = {r["doc_id"]: r for r in token_logfreq_score(docs).collect()}
    # 'the' appears 7/14 tokens; unique tokens 1/14 — doc1 must outscore doc2
    assert lf[1]["logfreq_ppm"] > lf[2]["logfreq_ppm"]
    assert lf[1]["n_tokens"] == 4 and lf[2]["n_tokens"] == 4
    import math
    expected_doc1 = math.floor(1_000_000 * math.log10(7 / 14))
    assert lf[1]["logfreq_ppm"] == expected_doc1


def test_gopher_repetition_signals_hand_computed(spark):
    from pcrawler_spark.operators.textstats import gopher_repetition_signals

    docs = spark.createDataFrame(
        [
            # doc 1: "ab cd ab cd ab" — 2-grams: "ab cd"×2, "cd ab"×2, tie on
            # count → tie-break picks the lexicographically smaller "ab cd"
            # (len 5, cnt 2); n_chars=14; 5-grams: one (whole doc) → no dup
            (1, "ab cd ab cd ab"),
            # doc 2: all-unique words — top 2-gram cnt 1, no dup 5-grams
            (2, "alpha beta gamma delta eps zeta eta theta iota kappa"),
            # doc 3: a 5-word slogan repeated 3× — every 5-gram window that
            # realigns repeats; dup5 coverage is high
            (3, "buy our great product now buy our great product now buy our great product now"),
            # doc 4: shorter than 5 words — one truncated 5-gram, no dup
            (4, "one two"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           gopher_repetition_signals(docs, top_n=2, dup_n=5).collect()}

    # doc1: top gram "ab cd" cnt=2 len=5, n_chars=14 → floor(1e6*10/14)
    assert out[1]["n_chars"] == 14
    assert out[1]["top2gram_char_ppm"] == 1_000_000 * 10 // 14
    assert out[1]["dup5gram_char_ppm"] == 0

    # doc2: every 2-gram unique → cnt=1; top coverage is small but nonzero
    assert out[2]["dup5gram_char_ppm"] == 0
    assert 0 < out[2]["top2gram_char_ppm"] < 300_000

    # doc3: 15 words; "buy our" ×3, "our great" ×3, "great product" ×3,
    # "product now" ×3, "now buy" ×2 — tie on cnt=3 → min lex "buy our"
    # (len 7).  Recompute both signals exactly in Python against the text.
    text3 = "buy our great product now buy our great product now buy our great product now"
    n_chars3 = len(text3)
    assert out[3]["n_chars"] == n_chars3
    assert out[3]["top2gram_char_ppm"] == 1_000_000 * 3 * len("buy our") // n_chars3
    words = text3.split(" ")
    grams = [" ".join(words[i:i + 5]) for i in range(len(words) - 4)]
    from collections import Counter
    c = Counter(grams)
    dup_chars = sum(cnt * len(g) for g, cnt in c.items() if cnt >= 2)
    assert dup_chars > 0
    assert out[3]["dup5gram_char_ppm"] == 1_000_000 * dup_chars // n_chars3

    # doc4: one truncated gram each; cnt=1 everywhere
    assert out[4]["dup5gram_char_ppm"] == 0
    # top 2-gram is the whole text "one two" (len 7 = n_chars) cnt 1 → 1e6
    assert out[4]["top2gram_char_ppm"] == 1_000_000


def test_gopher_quality_gate_rules(spark):
    from pcrawler_spark.operators.textstats import gopher_quality_gate

    docs = spark.createDataFrame(
        [
            # clean: 50+ words, normal lengths, stopwords present
            (1, " ".join(["the quick brown fox jumps over a lazy dog and"] * 6)),
            (2, "too short the a"),                                  # words
            (3, " ".join(["a"] * 60)),                               # wordlen low (mean 1)
            (4, " ".join(["the of"] * 30) + " " + " ".join(["#"] * 20)),  # symbol+alpha
            (5, " ".join(["alpha beta gamma delta"] * 15)),          # stops (no markers... beta has 'a'? markers are words)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_gate(docs).collect()}

    assert out[1]["passed"] and out[1]["fail_reasons"] == ""
    assert "words" in out[2]["fail_reasons"] and not out[2]["passed"]
    assert "wordlen" in out[3]["fail_reasons"]
    assert "symbol" in out[4]["fail_reasons"] and "alpha" in out[4]["fail_reasons"]
    assert "stops" in out[5]["fail_reasons"]

    # exact signal check for doc 1: 60 words, sum_len known
    words = (" ".join(["the quick brown fox jumps over a lazy dog and"] * 6)).split(" ")
    assert out[1]["n_words"] == len(words)
    assert out[1]["mean_word_len_ppm"] == 1_000_000 * sum(len(w) for w in words) // len(words)
    assert out[1]["alpha_word_ppm"] == 1_000_000
    assert out[1]["stop_hits"] == 3  # 'the', 'a', 'and'
