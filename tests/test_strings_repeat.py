"""longest_repeat_docs: exact longest intra-doc repeated substring —
kernel pinned by a brute-force oracle, op plumbing checked end-to-end."""

import numpy as np
import pytest


def _brute(s: str) -> int:
    # monotone in L: if a length-L repeat exists, so does length L-1
    best = 0
    for L in range(1, len(s)):
        seen, dup = set(), False
        for i in range(len(s) - L + 1):
            t = s[i:i + L]
            if t in seen:
                dup = True
                break
            seen.add(t)
        if not dup:
            break
        best = L
    return best


def test_longest_repeat_kernel_brute_force():
    from nise_ray.ops.strings import _longest_repeat_len
    rng = np.random.default_rng(11)
    alphabet = "abcd"
    for _ in range(400):
        n = int(rng.integers(0, 48))
        s = "".join(alphabet[int(k)] for k in rng.integers(0, 4, n))
        got = _longest_repeat_len(np.frombuffer(s.encode(), np.uint8))
        assert got == _brute(s), s


@pytest.mark.parametrize("s,want", [
    ("", 0), ("a", 0), ("ab", 0), ("aa", 1), ("aaaa", 3),
    ("abcabc", 3), ("abab", 2), ("xyzzyx", 1),
    ("the quick the quick", 9),  # "the quick" repeats at 0 and 10
])
def test_longest_repeat_known_cases(s, want):
    from nise_ray.ops.strings import _longest_repeat_len
    got = _longest_repeat_len(np.frombuffer(s.encode(), np.uint8))
    assert got == want, (s, got, want)


def test_longest_repeat_docs_op(ray_session):
    from nise_ray.ops.strings import _longest_repeat_len, longest_repeat_docs
    import pyarrow.parquet as pq
    got = longest_repeat_docs("/root/testdata/sf0.001").to_pandas() \
        .set_index("doc_id").sort_index()
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["doc_id", "text"])
    assert len(got) == t.num_rows
    # spot-check 25 docs against the kernel run driver-side
    ids = t.column("doc_id").to_pylist()[:25]
    txts = t.column("text").to_pylist()[:25]
    for i, s in zip(ids, txts):
        want = _longest_repeat_len(np.frombuffer(s.encode(), np.uint8))
        assert got.loc[i, "max_repeat_len"] == want
    # these synthetic docs repeat words heavily — metric must be live
    assert (got["max_repeat_len"] > 0).any()
