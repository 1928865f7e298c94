"""BPE tokenizer TRAINING on the corpus: the iterative merge loop that
turns `text_bpe_pair_counts` (one round's statistics) into an actual
merge table — the artifact an LLM data pipeline ships to tokenization.

Scale contract: the corpus text is read ONCE (token-frequency
aggregation). Every training round after that runs on the DISTINCT
vocabulary weighted by frequency — |vocab| rows, not corpus rows — so
k merge rounds cost k vocabulary-sized jobs plus one 1-row argmax
collect each (driver-side scalar, same class as the tf-idf corpus
count). The per-round merge rewrite is a map-side higher-order-function
fold; lineage is truncated every round with localCheckpoint so the plan
stays O(1) deep.

Rows-only registry entry: the merge sequence is iterative and
data-dependent (each round's input is the previous round's output),
which ANSI SQL cannot express; tests/test_tokenizer.py pins the full
merge table against an independent pure-Python BPE reference on the
same vocabulary, and checks determinism under repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_etl_spark.io.readers import load_table
from finance_etl_spark.plans.registry import register

TOKEN_PATTERN = "[a-z0-9']+"


def word_frequencies(d: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq): lowercase word frequencies — the single corpus
    pass. Everything downstream is vocabulary-sized."""
    toks = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_PATTERN), 0)
    ).alias("word")
    return d.select(toks).groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _adjacent_pairs(symbols):
    """array<struct<left,right>> of adjacent symbol pairs (empty for
    single-symbol words — guarded so sequence() never runs descending)."""
    n = F.size(symbols)
    pair_arr = F.transform(
        F.sequence(F.lit(0), n - 2),
        lambda i: F.struct(
            F.get(symbols, i).alias("left"), F.get(symbols, i + 1).alias("right")
        ),
    )
    empty = F.array().cast("array<struct<left:string,right:string>>")
    return F.when(n >= 2, pair_arr).otherwise(empty)


def _merge_pair(symbols, left: str, right: str):
    """Greedy left-to-right merge of (left,right) -> left||right inside
    one word's symbol array, as a single aggregate() fold: append each
    symbol, except when the accumulator's last element is `left` and
    the incoming symbol is `right` — then replace the last element with
    the merged symbol. Because a just-merged element no longer equals
    `left`, overlapping runs ("aaa" under the ("a","a") rule) resolve
    exactly like the canonical greedy scan."""
    lit_l, lit_r = F.lit(left), F.lit(right)
    merged = F.lit(left + right)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == lit_l)
            & (s == lit_r),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe(vocab: DataFrame, n_merges: int = 8) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merge rules from a (word, freq) relation.
    Returns [(left, right, pair_count), ...] in learned order.

    Tie-break is DETERMINISTIC: highest weighted count, then
    lexicographically smallest (left, right) — pinned so training is
    reproducible across partitionings and engines."""
    spark = vocab.sparkSession
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    state = vocab.select(
        F.col("freq"), chars.alias("symbols")
    ).localCheckpoint(eager=True)
    rules: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        best = (
            state.select("freq", F.explode(_adjacent_pairs(F.col("symbols"))).alias("p"))
            .groupBy("p.left", "p.right")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["n"] is None:
            break
        left, right, n = best[0]["left"], best[0]["right"], int(best[0]["n"])
        rules.append((left, right, n))
        state = state.select(
            "freq", _merge_pair(F.col("symbols"), left, right).alias("symbols")
        ).localCheckpoint(eager=True)
    return rules


@register("text_bpe_train_merges", tags=("text", "tokenizer", "iterative"))
def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full BPE training over the documents corpus: 8 learned merge
    rules with their weighted pair counts, in training order."""
    d = load_table(spark, sf_dir, "documents")
    rules = train_bpe(word_frequencies(d), n_merges=8)
    return spark.createDataFrame(
        [(i + 1, l, r, l + r, n) for i, (l, r, n) in enumerate(rules)],
        "rank int, left string, right string, merged string, n_occurrences bigint",
    )


def apply_bpe(
    vocab: DataFrame, rules: list[tuple[str, str, int]]
) -> DataFrame:
    """(word, freq, symbols): encode every word by replaying the merge
    rules IN TRAINING ORDER (the BPE encode contract — not best-match)
    over the distinct vocabulary. Each rule is one map-side fold over
    |vocab| rows; lineage is checkpointed every few rules so the plan
    depth stays bounded at large rule counts."""
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    state = vocab.select("word", "freq", chars.alias("symbols"))
    for i, (left, right, _n) in enumerate(rules):
        state = state.select(
            "word", "freq", _merge_pair(F.col("symbols"), left, right).alias("symbols")
        )
        if (i + 1) % 4 == 0:
            state = state.localCheckpoint(eager=True)
    return state


@register("text_bpe_encode", tags=("text", "tokenizer", "iterative"))
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end tokenizer: train 8 BPE merges on the corpus, then
    ENCODE the corpus with them and report the top-20 subword tokens
    by corpus frequency — the vocabulary histogram a tokenizer ships
    with. Encoding runs on the distinct-word table weighted by
    frequency (corpus text read once, both for training and coverage
    stats); tests/test_tokenizer.py pins the encoding against the
    pure-Python reference."""
    d = load_table(spark, sf_dir, "documents")
    wf = word_frequencies(d).persist()
    rules = train_bpe(wf, n_merges=8)
    enc = apply_bpe(wf, rules)
    out = (
        enc.select("freq", F.explode("symbols").alias("subword"))
        .groupBy("subword")
        .agg(F.sum("freq").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "subword")
        .limit(20)
    )
    return out


def wordpiece_encode_word(word: str, vocab: frozenset) -> list:
    """Greedy longest-match-first WordPiece encoding of one word
    (continuation pieces carry the ## prefix; unmatchable characters
    emit [UNK] and resync). Pure Python, deterministic; shared by the
    operator and the pytest reference."""
    pieces, i, first = [], 0, True
    while i < len(word):
        j = len(word)
        matched = None
        while j > i:
            cand = word[i:j] if first else "##" + word[i:j]
            if cand in vocab:
                matched = cand
                break
            j -= 1
        if matched is None:
            pieces.append("[UNK]")
            i += 1
        else:
            pieces.append(matched)
            i = j
        first = False
    return pieces


@register("text_wordpiece_encode", tags=("text", "tokenizer", "udf"))
def text_wordpiece_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece encoding of the corpus under a deterministic vocab
    (top-20 words as whole pieces + every observed character as both
    initial and ## continuation piece): per-piece usage statistics,
    the 'how will my tokenizer slice this corpus' report. The encode
    runs over the DISTINCT word list weighted by corpus frequency —
    the same vocabulary-sized trick as BPE training, so the corpus
    text is read once and the Python work is |vocab|-bounded. The
    greedy longest-match loop is inherently per-word sequential →
    Arrow-batched mapInPandas; the vocab is a broadcast-closure
    frozenset built from two vocabulary-sized collects. Rows-only
    (the iterative greedy is not ANSI-expressible);
    tests/test_round4_ops.py pins the piece table against a
    driver-side pure-Python encode of the same word-frequency list."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    wf = word_frequencies(d)
    top_words = [
        r["word"]
        for r in wf.orderBy(F.col("freq").desc(), "word").limit(20).collect()
    ]
    chars = [
        r["c"]
        for r in wf.select(
            F.explode(F.split("word", "")).alias("c")
        )
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    ]
    vocab = frozenset(
        set(top_words) | set(chars) | {"##" + c for c in chars}
    )

    def encode(batches):
        for pdf in batches:
            words, pieces, freqs = [], [], []
            for w, f in zip(pdf["word"], pdf["freq"]):
                for p in wordpiece_encode_word(w, vocab):
                    words.append(w)
                    pieces.append(p)
                    freqs.append(f)
            yield pd.DataFrame(
                {"word": words, "piece": pieces, "freq": freqs}
            )

    exploded = wf.mapInPandas(encode, "word string, piece string, freq long")
    return (
        exploded.groupBy("piece")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.sum("freq").alias("total_occurrences"),
        )
        .orderBy(F.col("total_occurrences").desc(), "piece")
        .limit(30)
    )


@register("text_tokenizer_fertility", tags=("text", "tokenizer"))
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer FERTILITY per corpus source — pieces emitted per word,
    the metric tokenizer teams track per language/domain to catch
    under-served segments (fertility ≫ 1 means the vocab fragments
    that source's text, inflating sequence lengths and training cost).
    Reuses the WordPiece machinery: encode the DISTINCT word list once
    (vocabulary-sized Python), then join the per-word piece counts
    back to per-(source, word) frequencies — the corpus text itself is
    scanned once for the frequency table and once for the source map;
    no per-document Python. Rows-only (greedy encode is
    engine-specific); the piece counts feeding it are pinned by
    test_round4_ops.py's reference encode."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    wf = word_frequencies(d)
    top_words = [
        r["word"]
        for r in wf.orderBy(F.col("freq").desc(), "word").limit(20).collect()
    ]
    chars = [
        r["c"]
        for r in wf.select(F.explode(F.split("word", "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    ]
    vocab = frozenset(set(top_words) | set(chars) | {"##" + c for c in chars})

    def encode_counts(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "n_pieces": [
                        len(wordpiece_encode_word(w, vocab))
                        for w in pdf["word"]
                    ],
                }
            )

    pieces_per_word = wf.select("word").mapInPandas(
        encode_counts, "word string, n_pieces int"
    )
    src_words = (
        d.select(
            "source",
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(TOKEN_PATTERN), 0
                )
            ).alias("word"),
        )
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        src_words.join(pieces_per_word, "word")
        .groupBy("source")
        .agg(
            F.sum("n").alias("n_words"),
            F.sum(F.col("n") * F.col("n_pieces")).alias("n_pieces"),
            (
                F.sum(F.col("n") * F.col("n_pieces")).cast("double")
                / F.sum("n").cast("double")
            ).alias("fertility"),
        )
        .orderBy("source")
    )
