"""Spectral feature parity vs reference C goldens (tests/goldens/spectral.npz:
inputs + 30 feature outputs produced by spectralObj_* on the same arrays)."""

import numpy as np
import pytest

from tests.conftest import assert_close_to_golden

from audioflux_tpu.features import Spectral

SIMPLE = [
    "flatness", "flux", "rolloff", "centroid", "spread", "skewness",
    "kurtosis", "entropy", "crest", "slope", "decrease", "band_width",
    "rms", "energy", "hfc", "sd", "sf", "mkl", "broadband", "novelty",
    "eef", "eer",
]


@pytest.fixture(scope="module")
def sp(goldens):
    g = goldens("spectral")
    obj = Spectral(num=128, fre_band_arr=g["in_fre"])
    return obj, g["in_spec"], g


@pytest.mark.parametrize("name", SIMPLE)
def test_simple_features(sp, name):
    obj, spec, g = sp
    out = getattr(obj, name)(spec)
    # features chain several float32 reductions; centroid-derived moments are
    # most sensitive
    tol = {"skewness": 2e-3, "kurtosis": 2e-3, "slope": 1e-3,
           "flatness": 1e-3}.get(name, 2e-4)
    assert_close_to_golden(out, g[name], tol, name)


def test_flux_variants(sp):
    obj, spec, g = sp
    out = obj.flux(spec, step=2, p=2, is_positive=True, is_exp=True, tp=1)
    assert_close_to_golden(out, g["flux_pos_exp_mean"], 2e-4,
                           "flux_pos_exp_mean")


def test_entropy_norm(sp):
    obj, spec, g = sp
    assert_close_to_golden(obj.entropy(spec, is_norm=True),
                           g["entropy_norm"], 2e-4, "entropy_norm")


def test_band_width_p1(sp):
    obj, spec, g = sp
    assert_close_to_golden(obj.band_width(spec, p=1), g["band_width_p1"],
                           2e-4, "band_width_p1")


def test_energy_log(sp):
    obj, spec, g = sp
    assert_close_to_golden(obj.energy(spec, is_log=True, gamma=10.0),
                           g["energy_log"], 2e-4, "energy_log")


def test_novelty_kl_number(sp):
    obj, spec, g = sp
    from audioflux_tpu.types import (SpectralNoveltyMethodType,
                                     SpectralNoveltyDataType)
    out = obj.novelty(spec, step=1, threshold=0.0,
                      method_type=SpectralNoveltyMethodType.KL,
                      data_type=SpectralNoveltyDataType.NUMBER)
    assert_close_to_golden(out, g["novelty_kl_num"], 1e-6, "novelty_kl_num")


def test_statistics(sp):
    obj, spec, g = sp
    mx_v, mx_f = obj.max(spec)
    assert_close_to_golden(mx_v, g["max_v"], 2e-4, "max_v")
    assert_close_to_golden(mx_f, g["max_f"], 1e-6, "max_f")
    mn_v, mn_f = obj.mean(spec)
    assert_close_to_golden(mn_v, g["mean_v"], 2e-4, "mean_v")
    assert_close_to_golden(mn_f, g["mean_f"], 1e-5, "mean_f")
    vr_v, vr_f = obj.var(spec)
    assert_close_to_golden(vr_v, g["var_v"], 2e-4, "var_v")
    assert_close_to_golden(vr_f, g["var_f"], 1e-5, "var_f")


def test_edge_subset(sp):
    obj, spec, g = sp
    obj2 = Spectral(num=128, fre_band_arr=obj.fre_band_arr)
    obj2.set_edge(10, 99)
    assert_close_to_golden(obj2.centroid(spec), g["edge_centroid"], 2e-4,
                           "edge_centroid")
    assert_close_to_golden(obj2.hfc(spec), g["edge_hfc"], 2e-4, "edge_hfc")
    assert_close_to_golden(obj2.decrease(spec), g["edge_decrease"], 2e-3,
                           "edge_decrease")
    assert_close_to_golden(obj2.rms(spec), g["edge_rms"], 2e-4, "edge_rms")


def test_phase_features(goldens):
    g = goldens("spectral")
    mspec, mphase = g["in_mspec"], g["in_mphase"]
    obj = Spectral(num=mspec.shape[0],
                   fre_band_arr=np.linspace(0, 16000, mspec.shape[0]
                                            ).astype(np.float32))
    assert_close_to_golden(obj.pd(mspec, mphase), g["pd"], 2e-4, "pd")
    assert_close_to_golden(obj.wpd(mspec, mphase), g["wpd"], 2e-4, "wpd")
    assert_close_to_golden(obj.nwpd(mspec, mphase), g["nwpd"], 2e-4, "nwpd")
    assert_close_to_golden(obj.cd(mspec, mphase), g["cd"], 2e-4, "cd")
    assert_close_to_golden(obj.rcd(mspec, mphase), g["rcd"], 2e-4, "rcd")


def test_batched_matches_single(sp):
    obj, spec, g = sp
    batch = np.stack([spec, spec * 0.5])
    out = np.asarray(obj.centroid(batch))
    single = np.asarray(obj.centroid(spec))
    np.testing.assert_allclose(out[0], single, rtol=1e-6)
    assert out.shape == (2, spec.shape[-1])
