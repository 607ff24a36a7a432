"""BPE merge-table training (functions/bpe.py): classic count-fuse rounds
with deterministic tie-breaks, early stop, and replay."""

from kgforge.functions.bpe import apply_bpe, pretoken_counts, train_bpe_merges


def test_train_bpe_merges_hand_example(spark):
    # vocab: 'ab' x3, 'abc' x2 -> round 1 fuses (a,b) count 5,
    # round 2 fuses (ab,c) count 2, round 3 finds nothing -> early stop
    words = spark.createDataFrame(
        [("ab", 3), ("abc", 2)], "tok string, cnt long"
    )
    got = [
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in train_bpe_merges(words, n_merges=5).orderBy("merge_rank").collect()
    ]
    assert got == [(1, "a", "b", 5), (2, "ab", "c", 2)]


def test_train_bpe_overlapping_pairs_and_greedy_rewrite(spark):
    # 'aaa': pair (a,a) counts at BOTH adjacent positions (classic BPE);
    # the rewrite is greedy left-to-right non-overlapping -> ['aa','a']
    words = spark.createDataFrame([("aaa", 1)], "tok string, cnt long")
    m = train_bpe_merges(words, n_merges=2).orderBy("merge_rank").collect()
    assert (m[0].left_sym, m[0].right_sym, m[0].pair_count) == ("a", "a", 2)
    # round 2: ['aa','a'] -> pair (aa, a) once
    assert (m[1].left_sym, m[1].right_sym, m[1].pair_count) == ("aa", "a", 1)


def test_apply_bpe_replays_training(spark):
    words = spark.createDataFrame(
        [("ab", 3), ("abc", 2), ("bc", 1)], "tok string, cnt long"
    )
    merges = [
        (r.left_sym, r.right_sym)
        for r in train_bpe_merges(words, n_merges=2).orderBy("merge_rank").collect()
    ]
    got = {r.tok: list(r.syms) for r in apply_bpe(words, merges).collect()}
    assert got["ab"] == ["ab"]
    assert got["abc"] == ["abc"] or got["abc"] == ["ab", "c"]
    # exactly the training end-state: 2 merges were (a,b) then (ab,c)
    assert merges == [("a", "b"), ("ab", "c")]
    assert got["abc"] == ["abc"]
    assert got["bc"] == ["b", "c"]  # no (b,c) merge was learned


def test_pretoken_counts_pattern(spark):
    docs = spark.createDataFrame(
        [("Hello, world 42!",), ("hello hello",)], "text string"
    )
    got = {r.tok: r.cnt for r in pretoken_counts(docs).collect()}
    assert got["hello"] == 3 and got["world"] == 1
    assert got["42"] == 1 and got[","] == 1 and got["!"] == 1


from hypothesis import given, settings
from hypothesis import strategies as st


def _bpe_reference(words: dict[str, int], n_merges: int):
    """Plain-python classic BPE trainer (the algorithm the Spark fold
    mirrors): weighted adjacent-pair counts with overlaps, top pair by
    (count desc, left, right), greedy left-to-right rewrite."""
    syms = {w: list(w) for w in words}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, s in syms.items():
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + words[w]
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b, c))
        for w, s in syms.items():
            out: list[str] = []
            for t in s:
                if out and out[-1] == a and t == b:
                    out[-1] = a + b
                else:
                    out.append(t)
            syms[w] = out
    return merges


@settings(max_examples=12, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(1, 9),
        min_size=1,
        max_size=8,
    ),
    st.integers(1, 4),
)
def test_train_bpe_matches_reference_property(spark, words, n_merges):
    """The distributed fold trainer equals a plain-python classic BPE on
    arbitrary small vocabularies (counts, tie-breaks, greedy rewrite,
    early stop)."""
    from kgforge.functions.bpe import train_bpe_merges

    w = spark.createDataFrame(list(words.items()), "tok string, cnt long")
    got = [
        (r.left_sym, r.right_sym, r.pair_count)
        for r in train_bpe_merges(w, n_merges=n_merges).orderBy("merge_rank").collect()
    ]
    assert got == _bpe_reference(words, n_merges)
