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
           "queue_fre2", "queue_fre3", "queue_direct", "queue_weak"]

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
    if value <= 0:
        # C: log2f(0) = -inf -> powf underflows to 0 for both tones
        return 0.0, 0.0
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


# ---------------------------------------------------------------------------
# strategy helpers (_queue.c statics)

def _valid_fre3(fre1, fre2, fre3, base, k1, k2, k3):
    """__validFre3 (_queue.c:7583): harmonic numbers must predict fre2/fre3."""
    s1 = abs(base * k2 - fre2)
    s2 = abs(base * k3 - fre3)
    if (s1 > 5 and fre1 < 880) or s1 > 10:
        return 0
    if s2 > 10:
        return 0
    return 1


def _max_index(arr, length):
    """__arr_maxIndex: argmax with first-win ties (C strict <)."""
    index = 0
    value = arr[0]
    for i in range(1, length):
        if value < arr[i]:
            value = arr[i]
            index = i
    return index


def queue_direct(fre_arr, db_arr, height_arr, index_arr, length,
                 light=0.0, valid=0):
    """__queue_direct (_queue.c:5516): resolve obvious 1:2:3-style stacks.

    Inputs are per-frame candidate arrays (frequency-ascending with their
    dominance ranks in ``index_arr``); returns the fundamental or 0.
    """
    if valid:
        return 0.0
    fre = 0.0
    if length >= 3:
        _index = _max_index(db_arr, length)
        arr1 = sorted(db_arr[:3], reverse=True)
        if arr1[0] - arr1[2] < 12:
            i1, i2, i3 = index_arr[0], index_arr[1], index_arr[2]
            us = uk = (0, 0, 0)
            uk1 = uk2 = uk3 = 0
            if i1 + i2 + i3 == 3:
                fre, _, _, uk1, uk2, uk3 = queue_fre3(
                    fre_arr[0], fre_arr[1], fre_arr[2])
            if fre:
                q_flag = _valid_fre3(fre_arr[0], fre_arr[1], fre_arr[2],
                                     fre, uk1, uk2, uk3)
                if not q_flag:  # format noise
                    fre = 0.0
                    if length >= 4:
                        _, _, _, uk1, uk2, uk3 = queue_fre3(
                            fre_arr[1], fre_arr[2], fre_arr[3])
                        if uk1 == 1:
                            fre = fre_arr[1]
                    if not fre and length >= 5:
                        _, _, _, uk1, uk2, uk3 = queue_fre3(
                            fre_arr[2], fre_arr[3], fre_arr[4])
                        if uk1 == 1:
                            fre = fre_arr[2]
                else:
                    if uk1 == 1 and uk2 == 3 and uk3 == 6:
                        if fre > 100:  # high-fre stack
                            if db_arr[0] < db_arr[1] < db_arr[2]:
                                fre = fre_arr[1]
                            elif length >= 4:
                                _, _, _, uk1, uk2, uk3 = queue_fre3(
                                    fre_arr[1], fre_arr[2], fre_arr[3])
                                if uk1 == 1:
                                    fre = fre_arr[1]
                    elif uk1 == 1 and uk2 == 2 and uk3 == 4:
                        if db_arr[1] > db_arr[2] > db_arr[0]:
                            return 0.0
                    elif 2 * uk1 == uk3:  # 1:x:2 -> slide
                        return 0.0
                    elif 2 * uk2 == uk3:  # x:1:2
                        fre = 0.0 if length > 5 else fre_arr[1]
                    elif (uk1 == 2 and uk2 == 4 and uk3 == 5
                          and _index == 2 and db_arr[0] < db_arr[1]
                          and 240 < fre_arr[2] < 250):
                        fre = 0.0
                    elif (uk1 == 7 and uk2 == 8 and uk3 == 12
                          and _index == 1
                          and 130 < fre_arr[1] / 2 < 160):
                        fre = fre_arr[1] / 2
                    else:
                        if uk1 != 1 and length >= 4:
                            _, _, _, uk1, uk2, uk3 = queue_fre3(
                                fre_arr[1], fre_arr[2], fre_arr[3])
                            if uk1 == 1:
                                fre = fre_arr[1]

    if not fre and length >= 3:
        if index_arr[0] + index_arr[1] + index_arr[2] == 3:
            _, _, _, uk1, uk2, uk3 = queue_fre3(
                fre_arr[0], fre_arr[1], fre_arr[2])
            if uk1 == 1 and uk2 == 2 and uk3 == 4:
                if db_arr[1] > db_arr[2] > db_arr[0]:
                    return 0.0
            elif uk1 and 2 * uk1 == uk3:
                return 0.0
    return fre


def _queue_weak_valid(fre_arr, db_arr, height_arr, index_arr, length):
    """__queue_weakValid (_queue.c:6774)."""
    index = _max_index(db_arr, length)
    if index == 1 and fre_arr[index] - fre_arr[index - 1] < 50:
        for i in range(index + 1, length):
            _fre, k1, k2 = queue_fre2(fre_arr[index], fre_arr[i])
            if k1 == 1:
                return _fre
    return 0.0


def queue_weak(fre_arr, db_arr, height_arr, index_arr, length,
               light=0.0, valid=0):
    """__queue_weak (_queue.c:6618): low-evidence frames (<=3 candidates)."""
    if length < 2:
        return 0.0
    fre = _queue_weak_valid(fre_arr, db_arr, height_arr, index_arr, length)
    if fre:
        return fre
    k1 = k2 = k3 = k4 = 0
    if length == 2:
        fre, k1, k2 = queue_fre2(fre_arr[0], fre_arr[1])
        if k1 == 2 and k2 == 3:
            if abs(db_arr[0] - db_arr[1]) > 8:
                fre = 0.0
        elif k1 == 1:
            if db_arr[0] < db_arr[1]:
                fre = 0.0
        else:
            fre = fre_arr[0] if db_arr[0] > db_arr[1] else fre_arr[1]
    elif length == 3:
        fre1, k1, k2 = queue_fre2(fre_arr[0], fre_arr[1])
        fre2, k3, k4 = queue_fre2(fre_arr[1], fre_arr[2])
        if k1:
            if k1 == 2 and k2 == 3:
                fre = fre1
                if db_arr[0] - db_arr[1] > 20 and fre_arr[0] > 220:
                    fre = fre_arr[0]
                if height_arr[0] < 5:
                    fre = fre_arr[1] if db_arr[1] - db_arr[0] > 10 else 0.0
            elif k1 == 1:
                if k2 == 2:
                    fre = fre2
                    if fre1 < 90 or db_arr[0] > db_arr[1]:
                        fre = fre1
                    elif fre1 > 300 and db_arr[1] - db_arr[0] < 2:
                        fre = fre1
                else:
                    fre = fre2 if db_arr[1] - db_arr[0] > 8 else fre1
        else:  # first candidate is noise
            if _max_index(db_arr, length) == 0:
                fre = fre_arr[0]
        if not fre:
            if (db_arr[0] - db_arr[1] > 20 and db_arr[1] > db_arr[2]
                    and fre_arr[0] > 220):
                return fre_arr[0]
        if not fre:
            if k3 == 1 and k4 < 4:
                fre = fre2
        if not fre:
            fre = fre_arr[_max_index(db_arr, length)]
    else:
        for i in range(length - 1):
            if index_arr[i] + index_arr[i + 1] == 1:
                if abs(db_arr[i] - db_arr[i + 1]) < 15:
                    fre = 0.0
                    break
    if fre:  # reject >6x spreads from sub-bass guesses
        _index = _max_index(db_arr, length)
        if 40 < fre < 50 and fre_arr[_index] / fre > 5.5:
            fre = fre_arr[_index]
        elif fre < 40 and fre_arr[_index] / fre > 7:
            fre = fre_arr[_index]
    return fre


def queue_fast(fre_arr, db_arr, height_arr, index_arr, length,
               fre_arr2=(), db_arr2=(), height_arr2=(), ref_length=0,
               light=0.0, valid=0):
    """__queue_fast (_queue.c:5113): strict 1:1-spacing stack resolution.

    ``fre_arr2``/``ref_length`` are the frame's wider (pre-cut) candidate
    set, consulted by the 1:2:6 validation branch.
    """
    def g2(arr, i):
        return arr[i] if i < len(arr) else 0.0

    if valid and ref_length > 5:
        return 0.0
    fre = 0.0

    if length >= 3:
        # 012 -> 1:1
        for i in range(length - 2):
            if index_arr[i] + index_arr[i + 1] + index_arr[i + 2] == 3:
                _fre, us1, us2, uk1, uk2, uk3 = queue_fre3(
                    fre_arr[i], fre_arr[i + 1], fre_arr[i + 2])
                if us1 == 1 and us1 == us2:
                    if (abs(_fre * uk2 - fre_arr[i + 1]) < 5
                            and abs(_fre * uk3 - fre_arr[i + 2]) < 5):
                        fre = _fre
                        if index_arr[i] == 0 and 2 * uk1 == uk3:
                            return 0.0
                break
        # 01x -> 1:1
        if not fre:
            for i in range(length - 2):
                if index_arr[i] + index_arr[i + 1] == 1:
                    _fre, us1, us2, uk1, uk2, uk3 = queue_fre3(
                        fre_arr[i], fre_arr[i + 1], fre_arr[i + 2])
                    if us1 == 1 and us1 == us2:
                        if (abs(_fre * uk2 - fre_arr[i + 1]) < 5
                                and abs(_fre * uk3 - fre_arr[i + 2]) < 5):
                            fre = _fre
                            if (index_arr[i] == 0 and 2 * uk1 == uk3
                                    and ref_length > 5):
                                return 0.0
                    break
        # 02x (023) -> 1:1
        if not fre:
            for i in range(length - 2):
                if (index_arr[i] + index_arr[i + 1] == 2
                        and index_arr[i + 2] == 3):
                    _fre, us1, us2, uk1, uk2, uk3 = queue_fre3(
                        fre_arr[i], fre_arr[i + 1], fre_arr[i + 2])
                    if us1 == 1 and us1 == us2:
                        if (abs(_fre * uk2 - fre_arr[i + 1]) < 5
                                and abs(_fre * uk3 - fre_arr[i + 2]) < 5):
                            fre = _fre
                            if index_arr[i] == 0 and 2 * uk1 == uk3:
                                return 0.0
                    break
        # 0xx -> 1:1
        if not fre and index_arr[0] == 0:
            _fre, us1, us2, uk1, uk2, uk3 = queue_fre3(
                fre_arr[0], fre_arr[1], fre_arr[2])
            if us1 == 1 and us1 == us2:
                if (abs(_fre * uk2 - fre_arr[1]) < 5
                        and abs(_fre * uk3 - fre_arr[2]) < 5):
                    fre = _fre
                    if 2 * uk1 == uk3:
                        return 0.0

    # 2. 1-24-5/7, 124-8-11, 2347 stacks
    if not fre and length >= 4:
        _fre, us1, us2, uk1, uk2, uk3 = queue_fre3(
            fre_arr[0], fre_arr[1], fre_arr[2])
        if uk1:
            _, vs1, vs2, vk1, vk2, vk3 = queue_fre3(
                fre_arr[1], fre_arr[2], fre_arr[3])
            if vk1:
                if (uk1 == 1 and uk2 == 2 and uk3 == 4
                        and ((vk1 == 2 and vk2 == 4 and vk3 == 5)
                             or (vk1 == 2 and vk2 == 4 and vk3 == 7))):
                    fre = _fre
                elif (uk1 == 2 and uk2 == 3 and uk3 == 4
                      and vk1 == 3 and vk2 == 4 and vk3 == 7):
                    fre = fre_arr[0] / 2
            else:
                if length >= 5 and uk1 == 1 and uk2 == 2 and uk3 == 4:
                    _, vs1, vs2, vk1, vk2, vk3 = queue_fre3(
                        fre_arr[2], fre_arr[3], fre_arr[4])
                    if vk1 == 4 and vk2 == 8 and vk3 == 11:
                        fre = fre_arr[0] / 2
            if (not fre and uk1 == 1 and uk2 == 2 and uk3 == 4
                    and db_arr[2] > db_arr[0] and db_arr[2] > db_arr[1]
                    and db_arr[0] > db_arr[1]
                    and 380 < fre_arr[2] < 405):
                fre = fre_arr[2] / 2

    # 3. 1:n around the dB-max candidate
    if not fre:
        index1 = _max_index(db_arr, length)
        if index1 == 1 and fre_arr[0] < 85 and ref_length < 5:
            _fre, uk1, uk2 = queue_fre2(fre_arr[0], fre_arr[1])
            if (uk1 == 1 and uk2 == 2
                    and abs(fre_arr[0] * 2 - fre_arr[1]) < 5):
                return _fre
        if index1 + 1 < length:
            _fre2 = fre_arr[index1 + 1]
            _fre, uk1, uk2 = queue_fre2(fre_arr[index1], fre_arr[index1 + 1])
            if not uk1 and index1 + 2 < length:
                _fre2 = fre_arr[index1 + 2]
                if 210 < _fre2 < 230:
                    _fre, uk1, uk2 = queue_fre2(fre_arr[index1],
                                                fre_arr[index1 + 2])
            if uk1 == 1 and uk2 in (2, 3):
                if abs(_fre * uk2 - _fre2) < 5:
                    fre = _fre
                    if (db_arr[index1] - db_arr[index1 + 1] > 18
                            and fre_arr[index1] > 130):
                        return fre
                    if fre > 330 and index1 + 2 < length:
                        _fre, us1, us2, uk1, uk2, uk3 = queue_fre3(
                            fre_arr[index1], fre_arr[index1 + 1],
                            fre_arr[index1 + 2])
                        if us1:
                            if (abs(fre_arr[index1] / uk1 * uk2
                                    - fre_arr[index1 + 1]) < 5
                                    and abs(fre_arr[index1] / uk1 * uk3
                                            - fre_arr[index1 + 2]) < 5):
                                fre = _fre
        if not index1:
            # validate against 1:2:4 / 1:3:6 overtone traps
            if fre and index1 + 2 < length:
                _fre, us1, us2, uk1, uk2, uk3 = queue_fre3(
                    fre_arr[index1], fre_arr[index1 + 1],
                    fre_arr[index1 + 2])
                if uk1 == 1 and ((uk2 == 2 and uk3 == 4)
                                 or (uk2 == 3 and uk3 == 6)):
                    fre = 0.0
                elif (uk1 == 1 and uk2 == 2 and uk3 == 6
                      and 190 < fre_arr[1] < 204):
                    fre = 0.0
                else:
                    if us1 and us1 == 2 * us2:  # 2:1 -> 1:3:4
                        if (abs(fre_arr[index1] / uk1 * uk2
                                - fre_arr[index1 + 1]) < 5
                                and abs(fre_arr[index1] / uk1 * uk3
                                        - fre_arr[index1 + 2]) < 5):
                            fre = _fre
        else:
            if fre and index1 == 1:
                _fre, us1, us2, uk1, uk2, uk3 = queue_fre3(
                    g2(fre_arr, 0), g2(fre_arr, 1), g2(fre_arr, 2))
                if uk1 == 1 and uk2 == 2 and uk3 == 6 and _fre < 90:
                    if db_arr[1] > db_arr[0] and db_arr[1] - db_arr[2] > 20:
                        if ref_length < 6:
                            return _fre
                        elif ref_length < 8:
                            _, us1, us2, uk1, uk2, uk3 = queue_fre3(
                                g2(fre_arr2, 0), g2(fre_arr2, 1),
                                g2(fre_arr2, 2))
                            if uk1 == 1 and uk2 == 2 and uk3 == 6:
                                _, us1, us2, uk1, uk2, uk3 = queue_fre3(
                                    g2(fre_arr2, 1), g2(fre_arr2, 2),
                                    g2(fre_arr2, 3))
                                if uk1 == 2 and uk2 == 6 and uk3 == 7:
                                    return _fre
                                if (g2(fre_arr2, 1) + g2(fre_arr2, 2)
                                        < g2(fre_arr2, 3)):
                                    _, us1, us2, uk1, uk2, uk3 = queue_fre3(
                                        g2(fre_arr2, 1) + g2(fre_arr2, 2),
                                        g2(fre_arr2, 3), g2(fre_arr2, 4))
                                    if uk1 == 8 and uk2 == 11 and uk3 == 12:
                                        return _fre
                _, us1, us2, uk1, uk2, uk3 = queue_fre3(
                    g2(fre_arr, 1), g2(fre_arr, 2), g2(fre_arr, 3))
                if (uk1 == 1 and ((uk2 == 2 and uk3 == 4)
                                  or (uk2 == 2 and uk3 == 6))
                        and 190 < fre_arr[2] < 204):
                    fre = 0.0
            if fre and ref_length > 5:
                for i in range(index1):
                    _fre, uk1, uk2 = queue_fre2(fre_arr[i], fre_arr[index1])
                    if uk1 == 1 and uk2 in (2, 3):
                        _fre, us1, us2, uk1, uk2, uk3 = queue_fre3(
                            fre_arr[i], fre_arr[index1],
                            g2(fre_arr, index1 + 1))
                        if (abs(_fre * uk2 - fre_arr[index1]) < 5
                                and abs(_fre * uk3
                                        - g2(fre_arr, index1 + 1)) < 5):
                            fre = 0.0
                        if not fre and index1 + 2 < length:
                            _fre, us1, us2, uk1, uk2, uk3 = queue_fre3(
                                fre_arr[index1], fre_arr[index1 + 1],
                                fre_arr[index1 + 2])
                            if us1 and us1 == 3 * us2:  # 3:1 -> 1:4:5
                                if (abs(fre_arr[i] * uk2
                                        - fre_arr[index1 + 1]) < 5
                                        and abs(fre_arr[i] * uk3
                                                - fre_arr[index1 + 2]) < 5):
                                    fre = _fre
                        break

    # valid ->197
    if not fre:
        index1 = _max_index(db_arr, length)
        if not index1 and 190 < fre_arr[index1] < 204:
            if db_arr[0] - db_arr[1] > 18:
                return fre_arr[0]
    return fre
