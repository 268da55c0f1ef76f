"""BPE tokenizer-training merge rounds (`ops/bpe.py`)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray


def _two_pass_py(symseq: str, l: str, r: str) -> str:
    pat, rep = f" {l} {r} ", f" {l}{r} "
    return f" {symseq} ".replace(pat, rep).replace(pat, rep).strip(" ")


def _two_pass_arrow(symseq: str, l: str, r: str) -> str:
    pat, rep = f" {l} {r} ", f" {l}{r} "
    x = pa.array([f" {symseq} "])
    x = pc.replace_substring(x, pattern=pat, replacement=rep)
    x = pc.replace_substring(x, pattern=pat, replacement=rep)
    return pc.utf8_trim(x, " ")[0].as_py()


def test_two_pass_merge_matches_python_and_is_complete():
    """Arrow's replace_substring == Python str.replace (the DuckDB
    `replace` twin, verified in the gate), and after TWO passes no
    adjacent (l, r) slot pair survives — the completeness property the
    module docstring argues (pass-1 skips are never adjacent)."""
    rng = np.random.RandomState(7)
    symbols = ["a", "b", "ab", "ba", "aa", "c"]
    for trial in range(300):
        n = rng.randint(1, 12)
        seq = [symbols[i] for i in rng.randint(0, len(symbols), n)]
        s = " ".join(seq)
        for (l, r) in [("a", "a"), ("a", "b"), ("ab", "a"), ("b", "ba")]:
            got = _two_pass_arrow(s, l, r)
            assert got == _two_pass_py(s, l, r)
            out = got.split(" ")
            assert not any(out[i] == l and out[i + 1] == r
                           for i in range(len(out) - 1)), (s, l, r, got)


def test_pair_partials_exact():
    from hedonic_ray.ops.bpe import _pair_partials

    batch = pa.table({
        "symseq": ["a b a b", "a a a", "x", "b a"],
        "tf": pa.array([3, 2, 5, 1], pa.int64()),
    })
    t = _pair_partials(batch)
    got = {(l, r): c for l, r, c in zip(t.column("l").to_pylist(),
                                        t.column("r").to_pylist(),
                                        t.column("c_partial").to_pylist())}
    # overlapping adjacent occurrences all count (Sennrich stats)
    assert got == {("a", "b"): 6, ("b", "a"): 3 + 1, ("a", "a"): 4}


def test_bpe_train_rounds_tiny_oracle():
    """Hand-checked two merges on a deterministic corpus."""
    from hedonic_ray.ops.bpe import bpe_train_rounds

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["low low low lower", "lowest low", "newer newest"],
    }))
    t = bpe_train_rounds(docs, rounds=2)
    rows = t.to_pylist()
    # word counts: low:4, lower:1, lowest:1, newer:1, newest:1.
    # (l,o) = 4+1+1 = 6 ties (o,w) = 6 -> lexicographic: ('l','o').
    assert rows[0]["left_sym"] == "l" and rows[0]["right_sym"] == "o"
    assert rows[0]["pair_count"] == 6
    # after merging 'lo': pair ('lo','w') has count 6 -> round 2
    assert rows[1]["left_sym"] == "lo" and rows[1]["right_sym"] == "w"
    assert rows[1]["pair_count"] == 6
    # corpus_len after round 2: low = 1 symbol ('low'); lower = low,e,r
    # = 3; lowest = 4; newer = 5; newest = 6 => 4*1+3+4+5+6 = 22
    assert rows[1]["corpus_len"] == 22
