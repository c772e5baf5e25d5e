"""CIGAR algebra tests, including character-level oracles that transcribe the
reference walks (Longread.cpp:375-420, Assemble.cpp:129-155) and fuzz the
op-level implementations against them."""

import numpy as np
import pytest

from haslr_tpu.core import cigar


def test_parse_to_string_roundtrip():
    for s in ["10M", "5M2I3M", "1M1D1M1I1M", "100M20D5I7M"]:
        ops, lens = cigar.parse(s)
        assert cigar.to_string(ops, lens) == s


def test_normalize_merges():
    ops = np.array([0, 0, 1, 2, 2, 0], dtype=np.uint8)
    lens = np.array([2, 3, 0, 1, 1, 4], dtype=np.int64)
    o, l = cigar.normalize(ops, lens)
    assert cigar.to_string(o, l) == "5M2D4M"


def test_lengths():
    ops, lens = cigar.parse("5M2I3D4M")
    assert cigar.query_len(ops, lens) == 11
    assert cigar.target_len(ops, lens) == 12
    assert cigar.n_columns(ops, lens) == 14
    assert cigar.n_matches(ops, lens) == 9


# ---------------------------------------------------------------------------
# character-level oracles (direct transcription of the reference semantics)
# ---------------------------------------------------------------------------

def _oracle_find_contig_pos(exp, lr_curr, c_curr, lr_step, c_step, lr_pos):
    """Reference find_contig_pos (Longread.cpp:375-420) on an expanded str."""
    exp = list(exp)
    i = 0
    n = len(exp)
    while i < n:
        if lr_curr == lr_pos:
            break
        if exp[i] == "M":
            c_curr += c_step
            lr_curr += lr_step
        elif exp[i] == "I":
            lr_curr += lr_step
        else:
            c_curr += c_step
        i += 1
    while i >= n or exp[i] != "M":
        prev = exp[i - 1]
        if prev == "M":
            c_curr -= c_step
            lr_curr -= lr_step
        elif prev == "I":
            lr_curr -= lr_step
        else:
            c_curr -= c_step
        i -= 1
    kept = "".join(exp[: i + 1])
    return kept, lr_curr, c_curr


def _oracle_find_lr_pos(exp, lr_curr, c_curr, lr_step, c_step, contig_pos):
    """Reference asm_find_lr_pos (Assemble.cpp:129-155) on an expanded str."""
    if (c_step > 0 and c_curr > contig_pos) or (c_step < 0 and c_curr < contig_pos):
        return None
    for ch in exp:
        if c_curr == contig_pos:
            break
        if ch == "M":
            c_curr += c_step
            lr_curr += lr_step
        elif ch == "I":
            lr_curr += lr_step
        else:
            c_curr += c_step
    return lr_curr


def _expand_str(ops, lens):
    return "".join("MID"[o] * int(l) for o, l in zip(ops, lens))


def _random_cigar(rng, max_ops=12):
    n = int(rng.integers(1, max_ops + 1))
    ops, lens = [0], [int(rng.integers(1, 6))]  # always start with M
    for _ in range(n - 1):
        o = int(rng.integers(0, 3))
        while o == ops[-1]:
            o = int(rng.integers(0, 3))
        ops.append(o)
        lens.append(int(rng.integers(1, 6)))
    return np.array(ops, dtype=np.uint8), np.array(lens, dtype=np.int64)


def test_truncate_at_query_simple():
    ops, lens = cigar.parse("2M1I1M")
    kept_ops, kept_lens, rq, rt = cigar.truncate_at_query(
        ops, lens, 0, 0, +1, +1, 2
    )
    # oracle: walk "MMIM" to lr_pos=2 -> kept "MM", (1, 1)
    assert cigar.to_string(kept_ops, kept_lens) == "2M"
    assert (rq, rt) == (1, 1)


def test_truncate_at_query_fuzz_vs_oracle():
    rng = np.random.default_rng(42)
    for _ in range(500):
        ops, lens = _random_cigar(rng)
        exp = _expand_str(ops, lens)
        qlen = cigar.query_len(ops, lens)
        if qlen < 2:
            continue
        q_start = int(rng.integers(0, 50))
        t_start = int(rng.integers(0, 50))
        for q_step, t_step in [(+1, +1), (+1, -1), (-1, +1), (-1, -1)]:
            q_pos = q_start + q_step * int(rng.integers(1, qlen))
            kept_o, kept_l, rq, rt = cigar.truncate_at_query(
                ops, lens, q_start, t_start, q_step, t_step, q_pos
            )
            ok, orq, ort = _oracle_find_contig_pos(
                exp, q_start, t_start, q_step, t_step, q_pos
            )
            assert _expand_str(kept_o, kept_l) == ok, (exp, q_start, q_pos)
            assert rq == orq
            assert rt == ort


def test_project_target_fuzz_vs_oracle():
    rng = np.random.default_rng(7)
    for _ in range(500):
        ops, lens = _random_cigar(rng)
        exp = _expand_str(ops, lens)
        tlen = cigar.target_len(ops, lens)
        q_start = int(rng.integers(0, 50))
        t_start = int(rng.integers(0, 50))
        for q_step, t_step in [(+1, +1), (+1, -1), (-1, +1), (-1, -1)]:
            # include out-of-range targets to exercise the fall-through
            t_pos = t_start + t_step * int(rng.integers(0, tlen + 3))
            got = cigar.project_target_to_query(
                ops, lens, q_start, t_start, q_step, t_step, t_pos
            )
            want = _oracle_find_lr_pos(exp, q_start, t_start, q_step, t_step, t_pos)
            assert got == want, (exp, q_start, t_start, q_step, t_step, t_pos)
            # behind-the-walk direction returns None
            behind = t_start - t_step
            assert (
                cigar.project_target_to_query(
                    ops, lens, q_start, t_start, q_step, t_step, behind
                )
                is None
            )
