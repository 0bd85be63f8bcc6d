import jax
import numpy as np
import pytest

from p2igan_tpu.data import masks as M


def _check_sti_properties(mat, H, W, bs):
    """Exactly one observed pixel per block cell."""
    for h0 in range(0, H, bs):
        for w0 in range(0, W, bs):
            cell = mat[h0:min(h0 + bs, H), w0:min(w0 + bs, W)]
            assert cell.sum() == 1.0


@pytest.mark.parametrize("H,W,bs", [(16, 16, 4), (20, 20, 6), (128, 128, 10)])
def test_sti_np(rng, H, W, bs):
    m = M.create_mask_np((5, H, W, 1), rng, "sti", block_sizes=[bs])
    assert m.shape == (5, H, W, 1)
    # constant across frames
    assert np.all(m == m[0])
    _check_sti_properties(m[0, :, :, 0], H, W, bs)


@pytest.mark.parametrize("H,W,bs", [(16, 16, 4), (20, 20, 6)])
def test_sti_jax(H, W, bs):
    m = np.asarray(M.sti_mask(jax.random.key(0), 4, H, W, 1, block_size=bs))
    assert np.all(m == m[0])
    _check_sti_properties(m[0, :, :, 0], H, W, bs)


def test_fi(rng):
    m = M.create_mask_np((10, 4, 4, 1), rng, "fi", interval=[2])
    frame_on = m[:, 0, 0, 0]
    np.testing.assert_array_equal(frame_on, [1, 0, 0, 1, 0, 0, 1, 0, 0, 1])
    # whole frames on/off
    assert np.all(m == frame_on[:, None, None, None])
    mj = np.asarray(M.fi_mask(jax.random.key(0), 10, 4, 4, 1, interval=[2]))
    np.testing.assert_array_equal(mj, m)


def test_nowcasting(rng):
    m = M.create_mask_np((8, 4, 4, 1), rng, "nowcasting", keep=3)
    np.testing.assert_array_equal(m[:3], 1.0)
    np.testing.assert_array_equal(m[3:], 0.0)
    mj = np.asarray(M.nowcasting_mask(8, 4, 4, 1, keep=3))
    np.testing.assert_array_equal(mj, m)


def test_stin(rng):
    m = M.create_mask_np((8, 16, 16, 1), rng, "stin", block_sizes=[4], keep=3)
    np.testing.assert_array_equal(m[:3], 1.0)
    # later frames share one sti pattern
    assert np.all(m[3:] == m[3])
    _check_sti_properties(m[4, :, :, 0], 16, 16, 4)
    mj = np.asarray(M.stin_mask(jax.random.key(1), 8, 16, 16, 1, block_size=4, keep=3))
    np.testing.assert_array_equal(mj[:3], 1.0)
    _check_sti_properties(mj[5, :, :, 0], 16, 16, 4)


def test_stis(tmp_path, rng):
    mat = (rng.random((12, 12)) < 0.1).astype(np.float64)
    f = tmp_path / "gauge.txt"
    np.savetxt(f, mat)
    m = M.create_mask_np((6, 12, 12, 1), rng, "stis", mask_file=str(f))
    assert np.all(m == mat[None, :, :, None])
    mj = np.asarray(M.stis_mask(np.asarray(mat), 6, 1))
    np.testing.assert_array_equal(mj, m)
    with pytest.raises(ValueError):
        M.create_mask_np((6, 10, 10, 1), rng, "stis", mask_file=str(f))


def test_jax_dispatcher_multi_blocksize():
    m = M.create_mask(jax.random.key(3), (4, 16, 16, 1), "sti", block_sizes=[4, 8])
    m = np.asarray(m)
    total = m[0, :, :, 0].sum()
    assert total in (16.0, 4.0)  # 4x4 grid of blocks or 2x2
