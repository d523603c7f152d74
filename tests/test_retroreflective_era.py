"""Effective retroreflective area tool (MeasureEffectiveRetroreflectiveArea)."""
import numpy as np

from aten_tpu.utils.retroreflective import era, era_table, gen_ray, ray_origins


def test_normal_incidence_era_two_thirds():
    # theta=0 -> ray along -front_normal.  A front point (a,b,c) on
    # x+y+z=P lands on the back plane at (a,b,c)-2P/3; it stays inside
    # the back triangle iff every component <= 2P/3, which cuts off the
    # three corner sub-triangles (1/9 of the area each): the analytic
    # normal-incidence ERA of a triangular corner-cube aperture is 2/3.
    v = np.asarray(era(np.float32(0.0), np.float32(0.0), n_orgs=100))
    assert v.shape == (1,)
    np.testing.assert_allclose(v[0], 2.0 / 3.0, atol=0.02)


def test_grazing_incidence_low_overlap():
    # near-grazing theta -> rays leave sideways; ERA collapses
    v = np.asarray(era(np.float32(np.pi / 2 - 0.05), np.float32(0.0), n_orgs=40))
    assert v[0] < 0.2


def test_monotone_falloff_and_range():
    thetas, phis, table = era_table(steps=12, n_orgs=30)
    assert table.shape == (12, 12)
    assert ((table >= 0) & (table <= 1)).all()
    # averaged over phi, ERA decreases from normal toward grazing
    prof = table.mean(axis=1)
    assert prof[0] > prof[-1]


def test_ray_frame_matches_reference():
    # GenRay at theta=0 must return the inverted front-face normal
    d = np.asarray(gen_ray(np.zeros(1, np.float32), np.zeros(1, np.float32)))[0]
    v0 = np.array([0, -1, 1.0])
    v1 = np.array([1, -1, 0.0])
    n = np.cross(v0 / np.linalg.norm(v0), v1 / np.linalg.norm(v1))
    n = -n / np.linalg.norm(n)
    np.testing.assert_allclose(d, n, atol=1e-6)
    # origin grid covers the triangle (a+b<=1) like cpp:76-91
    orgs = ray_origins(10)
    assert len(orgs) == sum(range(12)) or len(orgs) > 50
