"""DDM / Gaussian / centerpoint / watershed vs reference-semantics oracles."""
import heapq

import numpy as np
import pytest
import scipy.ndimage as ndi

from cdnet_tpu.ops import centerpoint, ddm, filters, watershed
from cdnet_tpu.ops import geometry as G


# --------------------------------------------------------------- DDM oracle
def oracle_circshift(m, direction, s1, s2):
    """getDirectionDiffMap.py:14-42 (zero-fill shifts)."""
    c, h, w = m.shape
    out = np.zeros_like(m)
    for k in range(c):
        x = m[k]
        if direction == 1:
            x = np.vstack((x[s1:, :], np.zeros_like(x[:s1, :])))
            x = np.hstack((x[:, s2:], np.zeros_like(x[:, :s2])))
        elif direction == 2:
            x = np.vstack((x[s1:, :], np.zeros_like(x[:s1, :])))
            x = np.hstack((np.zeros_like(x[:, (w - s2):]), x[:, :(w - s2)]))
        elif direction == 3:
            x = np.vstack((np.zeros_like(x[(h - s1):, :]), x[:(h - s1), :]))
            x = np.hstack((x[:, s2:], np.zeros_like(x[:, :s2])))
        elif direction == 4:
            x = np.vstack((np.zeros_like(x[(h - s1):, :]), x[:(h - s1), :]))
            x = np.hstack((np.zeros_like(x[:, (w - s2):]), x[:, :(w - s2)]))
        out[k] = x
    return out


def oracle_dd_map(label_direction, direction_classes):
    """getDirectionDiffMap.py:44-108 with label_to_vector from our geometry."""
    vec = np.asarray(G.label_to_vector(label_direction, direction_classes), np.float64)
    dir_os = vec.transpose(2, 0, 1)
    f5 = vec
    feats = []
    if direction_classes - 1 == 4:
        specs = [(1, 1, 0), (3, 0, 1), (4, 0, 1), (3, 1, 0)]
    else:
        specs = [(1, 1, 1), (1, 1, 0), (2, 1, 1), (3, 0, 1),
                 (4, 0, 1), (3, 1, 1), (3, 1, 0), (4, 1, 1)]
    for d, s1, s2 in specs:
        feats.append(oracle_circshift(dir_os, d, s1, s2).transpose(1, 2, 0))
    h, w = label_direction.shape
    cos_value = np.zeros((h, w, len(feats)))
    for k, f in enumerate(feats):
        num = f5[:, :, 0] * f[:, :, 0] + f5[:, :, 1] * f[:, :, 1]
        den = (np.sqrt(f5[:, :, 0] ** 2 + f5[:, :, 1] ** 2)
               * np.sqrt(f[:, :, 0] ** 2 + f[:, :, 1] ** 2) + 1e-6)
        cos_value[:, :, k] = num / den
    m = np.min(cos_value, axis=2)
    m[label_direction == 0] = 1
    dd = 1 - np.around(m)
    return (dd - dd.min()) / (dd.max() - dd.min())


class TestDDM:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_vs_oracle(self, seed):
        rng = np.random.RandomState(seed)
        lab = rng.randint(0, 9, size=(32, 32))
        got = np.asarray(ddm.generate_dd_map(lab, 9))
        want = oracle_dd_map(lab, 9)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_two_nuclei_boundary_lights_up(self):
        # two adjacent centripetal fields -> high DDM at their interface
        lab = np.zeros((16, 16), np.int64)
        lab[4:12, 2:7] = 6   # pointing down-right
        lab[4:12, 9:14] = 2  # pointing up-left
        got = np.asarray(ddm.generate_dd_map(lab, 9))
        assert got.max() == 1.0

    def test_uniform_field_is_zero(self):
        lab = np.full((8, 8), 3, np.int64)
        got = np.asarray(ddm.generate_dd_map(lab, 9))
        # interior of a uniform field has cos=1 -> dd 0; borders see zero-pads
        assert got[4, 4] == 0.0


class TestGaussian:
    def test_vs_scipy(self, rng):
        img = np.zeros((32, 32), np.float32)
        img[10, 12] = 255.0
        img[20, 5] = 255.0
        got = np.asarray(filters.gaussian_filter(img, sigma=2))
        want = ndi.gaussian_filter(img.astype(np.float64), sigma=2, order=0)
        np.testing.assert_allclose(got, want, atol=1e-3)

    def test_border_reflect(self):
        img = np.zeros((16, 16), np.float32)
        img[0, 0] = 100.0
        got = np.asarray(filters.gaussian_filter(img, sigma=2))
        want = ndi.gaussian_filter(img.astype(np.float64), sigma=2)
        np.testing.assert_allclose(got, want, atol=1e-4)


# --------------------------------------------------- centerpoint oracle
def oracle_centerpoint2(mask):
    """my_transforms_direction.py:651-685 minus numba."""
    import math
    n, m = mask.shape
    P = [(math.sin(2 * math.pi / 8 * i), math.cos(2 * math.pi / 8 * i)) for i in range(8)]
    now, x, y = -1.0, -1, -1
    for i in range(n):
        for j in range(m):
            if mask[i][j] > 0:
                ma, mi = 0.0, 1e7
                for k in range(8):
                    l, r = 0.0, 1000.0
                    for _ in range(30):
                        mid = (l + r) / 2
                        nx = round(i + P[k][0] * mid)
                        ny = round(j + P[k][1] * mid)
                        if 0 <= nx < n and 0 <= ny < m and mask[nx][ny] > 0:
                            l = mid
                        else:
                            r = mid
                    ma, mi = max(ma, r), min(mi, r)
                c = mi / ma
                if c > now:
                    now, x, y = c, i, j
    return [int(x), int(y)]


class TestCenterpoint:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_vs_oracle(self, seed):
        rng = np.random.RandomState(seed)
        lab = np.zeros((24, 24), np.int32)
        hh, ww = np.mgrid[0:24, 0:24]
        lab[(hh - 8) ** 2 + (ww - 7) ** 2 <= 25] = 1
        lab[(hh - 16) ** 2 + (2 * (ww - 16)) ** 2 <= 36] = 2  # ellipse
        centers, valid = centerpoint.instance_centers(lab, max_instances=4)
        centers, valid = np.asarray(centers), np.asarray(valid)
        assert valid[0] and valid[1] and not valid[2]
        for k in (1, 2):
            want = oracle_centerpoint2((lab == k).astype(np.int64))
            np.testing.assert_array_equal(centers[k - 1], want)

    def test_center_inside(self, rng):
        lab = np.zeros((20, 20), np.int32)
        lab[3:9, 3:15] = 1
        centers, valid = centerpoint.instance_centers(lab, max_instances=2)
        c = np.asarray(centers)[0]
        assert lab[c[0], c[1]] == 1


# --------------------------------------------------- watershed oracle
def oracle_watershed(dist, markers, mask):
    """skimage-style priority flood: increasing -dist, FIFO ties, 4-conn."""
    h, w = dist.shape
    labels = np.where(mask, markers, 0).astype(np.int64)
    heap = []
    counter = 0
    for i in range(h):
        for j in range(w):
            if labels[i, j] > 0:
                heapq.heappush(heap, (-int(dist[i, j]), counter, i, j))
                counter += 1
    while heap:
        _, _, i, j = heapq.heappop(heap)
        for di, dj in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            ni, nj = i + di, j + dj
            if 0 <= ni < h and 0 <= nj < w and mask[ni, nj] and labels[ni, nj] == 0:
                labels[ni, nj] = labels[i, j]
                heapq.heappush(heap, (-int(dist[ni, nj]), counter, ni, nj))
                counter += 1
    return labels


class TestWatershed:
    def test_markerless_component_stays_unlabeled(self):
        """A mask component with NO marker must come out 0 (skimage leaves it
        unlabeled). Regression: the line-scan barrier cap ``_NEG - mu``
        rounded back to ``_NEG`` in float32, tying the unlabeled state so the
        label tie-break adopted a flood leaked across the barrier."""
        mask = np.zeros((16, 32), bool)
        mask[4:12, 2:12] = True      # left component, marked
        mask[4:12, 20:30] = True     # right component, markerless
        markers = np.zeros((16, 32), np.int32)
        markers[8, 6] = 1
        dist = np.full((16, 32), 5.0, np.float32)
        out = np.asarray(watershed.watershed(dist, markers, mask))
        assert (out[4:12, 2:12] == 1).all()
        assert (out[4:12, 20:30] == 0).all()

    def test_scan_accelerator_preserves_fixpoint(self):
        """The line-scan operator is non-associative in the label plane, so
        intermediate scan outputs are scan-tree dependent — but the
        while_loop fixpoint must be identical with and without the scan
        accelerator (tie-heavy flat plateau forces maximal tie mass)."""
        rng = np.random.RandomState(3)
        mask = rng.rand(48, 64) > 0.25
        markers = np.zeros((48, 64), np.int32)
        for k, (y, x) in enumerate([(5, 5), (40, 10), (20, 50), (44, 60)], 1):
            if mask[y, x]:
                markers[y, x] = k
            else:
                mask[y, x] = True
                markers[y, x] = k
        dist = np.full((48, 64), 7.0, np.float32)  # one giant plateau
        fast = np.asarray(watershed.watershed(dist, markers, mask))
        slow = np.asarray(watershed.watershed(dist, markers, mask,
                                              use_scans=False))
        assert np.array_equal(fast, slow)

    def test_two_basins(self):
        # two distance peaks inside one connected mask -> split into 2 regions
        h = w = 32
        hh, ww = np.mgrid[0:h, 0:w]
        mask = np.zeros((h, w), bool)
        mask[8:24, 4:28] = True
        d1 = np.maximum(0, 10 - np.hypot(hh - 16, ww - 10))
        d2 = np.maximum(0, 10 - np.hypot(hh - 16, ww - 22))
        dist = np.maximum(d1, d2)
        dist = (dist / dist.max() * 255).astype(np.uint8)
        markers = np.zeros((h, w), np.int32)
        markers[16, 10] = 1
        markers[16, 22] = 2
        got = np.asarray(watershed.watershed(dist, markers, mask))
        want = oracle_watershed(dist, markers, mask)
        # same coverage, markers preserved
        assert (got > 0).sum() == mask.sum()
        assert got[16, 10] == 1 and got[16, 22] == 2
        # regions must agree except on plateau ties near the ridge
        agree = (got == want).mean()
        assert agree > 0.95, agree
        # both sides dominated by their marker
        assert (got[:, :16] == 1).sum() > (got[:, :16] == 2).sum()
        assert (got[:, 16:] == 2).sum() > (got[:, 16:] == 1).sum()

    def test_mask_respected(self):
        mask = np.zeros((16, 16), bool)
        mask[2:14, 2:8] = True
        dist = np.full((16, 16), 100, np.uint8)
        markers = np.zeros((16, 16), np.int32)
        markers[8, 4] = 3
        got = np.asarray(watershed.watershed(dist, markers, mask))
        assert set(np.unique(got)) == {0, 3}
        assert (got == 3).sum() == mask.sum()

    @pytest.mark.slow
    def test_metric_space_vs_fifo_oracle(self):
        """Regression for the round-2 plateau-tie loss: through the FULL
        postproc=1 pipeline on a dense tile, the hop-penalized device
        watershed must not score below the skimage-FIFO oracle by more than
        0.002 AJI (experiments/ws_divergence/RESULTS.md sweeps 5 seeds; this
        pins one)."""
        import jax.numpy as jnp

        import reference_oracle as ro
        ro.install()
        from cdnet_tpu.data.synthetic import synthetic_tile
        from cdnet_tpu.metrics import get_fast_aji
        from cdnet_tpu.metrics.objects import label_equal_values
        from cdnet_tpu.ops.postproc import instances_from_pred

        rng = np.random.RandomState(11)
        _, inst, _ = synthetic_tile(rng, 256, (40, 70))
        pred_inside = inst > 0

        dev_lab = np.asarray(instances_from_pred(
            jnp.asarray(pred_inside.astype(np.int32)), min_area=20, radius=2,
            use_watershed=True)[0])

        lab, _ = ndi.label(pred_inside, ndi.generate_binary_structure(2, 1))
        dist = np.zeros(pred_inside.shape, np.float64)
        for k in range(1, lab.max() + 1):
            m = lab == k
            d = ndi.distance_transform_edt(m)
            if d.max() > 0:
                dist[m] = d[m] / d.max()
        dist8 = (255.0 * dist).astype(np.uint8)
        marker = ndi.binary_erosion(ndi.binary_fill_holes(dist8 > 125))
        mlab, _ = ndi.label(marker, ndi.generate_binary_structure(2, 1))
        mlab = ro.remove_small_objects(mlab.astype(np.int64), 10)
        ws = ro.watershed(-dist8.astype(np.float64), mlab, mask=pred_inside)
        ws = ro.remove_small_objects(ws, 10)
        orc_lab = ro.dilation(ws.astype(np.int32), ro.disk(2))

        gt = label_equal_values(inst)
        dev_aji = get_fast_aji(gt, label_equal_values(dev_lab))[0]
        orc_aji = get_fast_aji(gt, label_equal_values(orc_lab))[0]
        assert dev_aji >= orc_aji - 0.002, (dev_aji, orc_aji)
