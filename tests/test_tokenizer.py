"""BPE training pinned against an independent pure-Python reference
implementation (canonical Sennrich-style greedy merge) on the same
vocabulary, plus determinism under repartitioning."""

from collections import Counter

from finance_etl_spark.plans.tokenizer import train_bpe


def _ref_bpe(word_freq: dict[str, int], n_merges: int):
    """Reference implementation: dict-of-tuples vocabulary, greedy
    left-to-right merge, (count desc, pair asc) tiebreak."""
    vocab = {tuple(w): f for w, f in word_freq.items()}
    rules = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((a, b, n))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return rules


WORDS = {
    "low": 5, "lower": 2, "lowest": 3, "newest": 6, "widest": 3,
    "new": 4, "wide": 2, "a": 7, "ab": 1,
}


def test_bpe_matches_reference(spark):
    vocab = spark.createDataFrame(
        list(WORDS.items()), "word string, freq long"
    )
    got = train_bpe(vocab, n_merges=10)
    assert got == _ref_bpe(WORDS, 10)


def test_bpe_overlapping_runs(spark):
    # "aaaa" under rule (a,a): greedy gives [aa, aa] — the fold must
    # not re-merge a just-merged element ([aa, a, a] -> [aa, aa], not
    # [aaa, a] or [aaaa])
    words = {"aaaa": 3, "aaa": 2, "b": 1}
    vocab = spark.createDataFrame(list(words.items()), "word string, freq long")
    got = train_bpe(vocab, n_merges=3)
    assert got == _ref_bpe(words, 3)


def test_bpe_repartition_deterministic(spark):
    vocab = spark.createDataFrame(list(WORDS.items()), "word string, freq long")
    a = train_bpe(vocab.repartition(7), n_merges=6)
    b = train_bpe(vocab.coalesce(1), n_merges=6)
    assert a == b == _ref_bpe(WORDS, 6)


def _ref_encode(word, rules):
    syms = list(word)
    for a, b, _ in rules:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def test_bpe_encode_matches_reference(spark):
    from finance_etl_spark.plans.tokenizer import apply_bpe, train_bpe

    vocab = spark.createDataFrame(list(WORDS.items()), "word string, freq long")
    rules = train_bpe(vocab, n_merges=6)
    got = {r.word: list(r.symbols) for r in apply_bpe(vocab, rules).collect()}
    for w in WORDS:
        assert got[w] == _ref_encode(w, rules), w
