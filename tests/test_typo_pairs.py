"""_ed_le1: exact two-pointer edit-distance<=1 vs a reference DP."""

import itertools

from commons_codec_ray.pipelines.queries import _ed_le1


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_ed_le1_matches_dp_exhaustively():
    # every pair of strings over a 2-letter alphabet up to length 4:
    # covers equal, substitution, indel at every position, and all the
    # >1 cases the deletion-neighborhood candidates can produce
    alpha = "ab"
    words = [""] + [
        "".join(w)
        for n in range(1, 5)
        for w in itertools.product(alpha, repeat=n)
    ]
    for x in words:
        for y in words:
            assert _ed_le1(x, y) == (_lev(x, y) <= 1), (x, y)


def test_ed_le1_longer_cases():
    assert _ed_le1("w123", "w123a")
    assert _ed_le1("w123a", "w123b")
    assert not _ed_le1("w123ab", "w123ba")
    assert not _ed_le1("w12", "w1234")


def test_ed_le_k_matches_dp_exhaustively():
    from commons_codec_ray.pipelines.queries import _ed_le

    alpha = "ab"
    words = [""] + [
        "".join(w)
        for n in range(1, 5)
        for w in itertools.product(alpha, repeat=n)
    ]
    for k in (1, 2, 3):
        for x in words:
            for y in words:
                assert _ed_le(x, y, k) == (_lev(x, y) <= k), (x, y, k)


def test_depth2_neighborhood_candidates_are_complete():
    # FastSS completeness at depth 2: every pair within ED<=2 over a
    # small vocabulary shares a <=2-deletion variant
    from itertools import combinations

    def nbhd(s, depth=2):
        vs = {s}
        for r in range(1, min(depth, len(s)) + 1):
            for pos in combinations(range(len(s)), r):
                t = s
                for p in reversed(pos):
                    t = t[:p] + t[p + 1 :]
                vs.add(t)
        return vs

    vocab = ["w1", "w1a", "w1b", "w1ab", "w1ba", "w2", "w12", "w21ab"]
    for x in vocab:
        for y in vocab:
            if x != y and _lev(x, y) <= 2:
                assert nbhd(x) & nbhd(y), (x, y)
