"""Frequency-ratio primitives of the _queue candidate engine (exact port).

Reference ``src/util/flux_util.c`` (util_calTone:193, util_calToneTimes:220,
util_calRangeTimes:276) and ``src/mir/_queue.c`` (__queue_fre2:306,
__queue_fre3:95).  These are the ratio tests every _queue strategy and the
tune-track heuristics are built on: "is f2 an integer multiple of f1 when
both are snapped to the midi grid (with nearest-neighbour tone fallback)",
and the 2- / 3-candidate harmonic-base solvers.

Host-side scalar code (the candidate sets are tiny per frame); fuzz-verified
against the C symbols, which the reference exports (tests/test_queue_util).
"""

from __future__ import annotations

import math

__all__ = ["cal_tone", "cal_tone_times", "cal_range_times",
           "queue_fre2", "queue_fre3"]

_EPS = 0.81


def _roundf(x: float) -> int:
    """C roundf: ties away from zero (Python round is banker's)."""
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _midi_fre(midi: int) -> float:
    # powf(2, (midi-69)/12)*440 in float32
    import numpy as np
    return float(np.float32(2.0 ** ((midi - 69) / 12.0) * 440.0))


def cal_tone(value: float):
    """-> (tone frequency of the nearest midi, the 2nd-nearest tone)."""
    midi = _roundf(12 * math.log2(value / 440.0) + 69)
    cur = _midi_fre(midi)
    pre = _midi_fre(midi - 1)
    nxt = _midi_fre(midi + 1)
    sel = nxt if nxt - value < value - pre else pre
    return cur, sel


def cal_tone_times(value1: float, value2: float):
    """-> (k, type): k such that the tone of k*min == the other, else 0.
    type=1 when value1 > value2 (inverted ratio)."""
    if not value1 or not value2:
        return 0, 0
    t = 0
    if abs(value1 - value2) < _EPS:
        k = 1
    elif value2 - value1 > _EPS:
        k = _roundf(value2 / value1)
        tone, _ = cal_tone(k * value1)
        if not abs(value2 - tone) < _EPS:
            k = 0
    else:
        k = _roundf(value1 / value2)
        tone, _ = cal_tone(k * value2)
        if not abs(value1 - tone) < _EPS:
            k = 0
        t = 1
    return k, t


def cal_range_times(value1: float, value2: float):
    """util_calRangeTimes: tone-times with 2nd-nearest-tone fallbacks and a
    +-1 correction for large k.  -> (k, type)."""
    v1, s1 = cal_tone(value1)
    v2, s2 = cal_tone(value2)

    slack1 = 10.0 if value1 > 660 else (5.0 if value1 > 330 else 0.0)
    slack2 = 10.0 if value2 > 660 else (5.0 if value2 > 330 else 0.0)
    flag1 = abs(abs(v1 - value1) - abs(s1 - value1)) < slack1
    flag2 = abs(abs(v2 - value2) - abs(s2 - value2)) < slack2

    k, t = cal_tone_times(v1, v2)
    if not k and (value1 < 330 or flag1):
        k, t = cal_tone_times(s1, v2)
        if not k and (value2 < 330 or flag2):
            k, t = cal_tone_times(v1, s2)
            if not k:
                k, t = cal_tone_times(s1, s2)

    if k > 10:
        e1 = abs((k - 1) * value1 - value2)
        e2 = abs(k * value1 - value2)
        e3 = abs((k + 1) * value1 - value2)
        if e1 < e2 and e1 < e3:
            k -= 1
        elif e3 < e1 and e3 < e2:
            k += 1
    return k, t


def queue_fre2(value1: float, value2: float):
    """__queue_fre2: base frequency + harmonic numbers of two candidates.
    -> (fre, k1, k2); fre == 0 when no harmonic relation found."""
    fre, k1, k2 = 0.0, 0, 0
    k, _ = cal_range_times(value1, value2)
    if k:
        fre, k1, k2 = value1, 1, k
    else:
        sub = value2 - value1
        got = False
        _k2, _ = cal_range_times(sub, value2)
        if _k2:
            _k1, t = cal_range_times(sub, value1)
            if _k1 and not t:
                fre, k1, k2 = value1 / _k1, _k1, _k2
                got = True
        if not got:
            sub /= 2
            _k2, _ = cal_range_times(sub, value2)
            if _k2:
                _k1, t = cal_range_times(sub, value1)
                if _k1 and not t:
                    fre, k1, k2 = value1 / _k1, _k1, _k2
    if not fre:
        k1 = k2 = 0
    return fre, k1, k2


def queue_fre3(value1: float, value2: float, value3: float):
    """__queue_fre3: base frequency + spacings + harmonic numbers of three
    ascending candidates.  -> (base, s1, s2, k1, k2, k3)."""
    base = 0.0
    k1 = k2 = k3 = 0
    s1 = s2 = 0

    sub1 = value2 - value1
    sub2 = value3 - value2
    g_flag = 0
    if sub1 > sub2:
        sub1, sub2 = sub2, sub1
        g_flag = 1

    k, _ = cal_range_times(sub1, sub2)
    if k == 1:  # 1:1
        k1, _ = cal_range_times(sub1, value1)
        k2, _ = cal_range_times(sub1, value2)
        if k1 and k2:
            k3 = k2 + 1
            s1 = s2 = 1
            base = value1 / k1
        else:  # 2:2
            k1, _ = cal_range_times(sub1 / 2, value1)
            k2, _ = cal_range_times(sub1 / 2, value2)
            if k1 and k2:
                k3 = k2 + 2
                if k1 % 2 == 1:
                    s1 = s2 = 2
                    base = value1 / k1
                else:
                    s1 = s2 = 1
                    k1 //= 2
                    k2 //= 2
                    k3 //= 2
                    base = value1 / k1
    elif 2 <= k <= 4:  # 1:2 1:3 1:4
        k1, _ = cal_range_times(sub1, value1)
        k2, _ = cal_range_times(sub1, value2)
        if k1 and k2:
            k3 = k2 + (1 if g_flag else k)
            s1 = k if g_flag else 1
            s2 = 1 if g_flag else k
            base = value1 / k1
    else:  # 2:3
        sub = sub2 - sub1
        a, _ = cal_range_times(sub, sub1)
        b, _ = cal_range_times(sub, sub2)
        if a == 2 and b == 3:
            k1, _ = cal_range_times(sub1 / 2, value1)
            k2, _ = cal_range_times(sub1 / 2, value2)
            if k1 and k2:
                k3 = k2 + (2 if g_flag else 3)
                s1 = 3 if g_flag else 2
                s2 = 2 if g_flag else 3
                base = value1 / k1

    if not base:
        k = _roundf(sub2 / sub1)
        if k == 1:
            k1 = _roundf(value1 / sub1)
            k2 = _roundf(value2 / sub1)
            # C divides unguarded: k1==0 yields inf and the <5 validity
            # check below then clears base (mirrored via math.inf)
            if k1 + 1 == k2:
                k3 = k2 + 1
                s1 = s2 = 1
                base = value1 / k1 if k1 else math.inf
            else:
                k1 = _roundf(value1 / (sub1 / 2))
                k2 = _roundf(value2 / (sub1 / 2))
                if k1 + 2 == k2:
                    k3 = k2 + 2
                    s1 = s2 = 2
                    base = value1 / k1 if k1 else math.inf
        elif 2 <= k <= 4:
            k1 = _roundf(value1 / sub1)
            k2 = _roundf(value2 / sub1)
            if k1 and k2:
                k3 = k2 + (1 if g_flag else k)
                s1 = k if g_flag else 1
                s2 = 1 if g_flag else k
                base = value1 / k1
        if base:
            h = value1 / k1 if k1 else math.inf
            if not (abs(value2 - h * k2) < 5
                    and abs(value3 - h * k3) < 5):
                base = 0.0

    if not base:
        s1 = s2 = k1 = k2 = k3 = 0
    return base, s1, s2, k1, k2, k3
