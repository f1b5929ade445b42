"""Instance/pixel metric tests vs an oracle re-implementing the reference's
per-instance-loop semantics (`/root/reference/stats_utils.py`, `utils.py:12-109`)."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from cdnet_tpu.metrics import (
    accuracy_pixel_level,
    get_dice_1,
    get_fast_aji,
    get_fast_aji_plus,
    get_fast_dice_2,
    get_fast_pq,
    remap_label,
)


# ---------------------------------------------------------------- oracles
def oracle_aji(true, pred):
    """Verbatim re-implementation of stats_utils.py:7-98 (loop form)."""
    true_ids = list(np.unique(true))
    pred_ids = list(np.unique(pred))
    t_masks = {t: (true == t).astype(np.uint8) for t in true_ids[1:]}
    p_masks = {p: (pred == p).astype(np.uint8) for p in pred_ids[1:]}
    nt, npred = len(true_ids) - 1, len(pred_ids) - 1
    inter = np.zeros((nt, npred))
    union = np.zeros((nt, npred))
    fp_m = np.zeros((nt, npred))
    fn_m = np.zeros((nt, npred))
    for t in true_ids[1:]:
        tm = t_masks[t]
        for p in np.unique(pred[tm > 0]):
            if p == 0:
                continue
            pm = p_masks[p]
            total = (tm + pm).sum()
            i = (tm * pm).sum()
            inter[t - 1, p - 1] = i
            union[t - 1, p - 1] = total - i
            fp_m[t - 1, p - 1] = pm.sum() - i
            fn_m[t - 1, p - 1] = tm.sum() - i
    iou = inter / (union + 1e-6)
    paired_pred = np.argmax(iou, axis=1)
    max_iou = np.max(iou, axis=1)
    paired_true = np.nonzero(max_iou > 0)[0]
    paired_pred = paired_pred[paired_true]
    oi = inter[paired_true, paired_pred].sum()
    ou = union[paired_true, paired_pred].sum()
    ofp = fp_m[paired_true, paired_pred].sum()
    ofn = fn_m[paired_true, paired_pred].sum()
    pt_ids = list(paired_true + 1)
    pp_ids = list(paired_pred + 1)
    less = more = 0
    for t in [i for i in true_ids[1:] if i not in pt_ids]:
        less += t_masks[t].sum()
        ou += t_masks[t].sum()
    for p in [i for i in pred_ids[1:] if i not in pp_ids]:
        more += p_masks[p].sum()
        ou += p_masks[p].sum()
    fm = ou - oi
    return oi / ou, ofp / fm, ofn / fm, less / fm, more / fm


def oracle_pq(true, pred, match_iou=0.5):
    """Verbatim re-implementation of stats_utils.py:182-275."""
    true_ids = list(np.unique(true))
    pred_ids = list(np.unique(pred))
    nt, npred = len(true_ids) - 1, len(pred_ids) - 1
    iou = np.zeros((nt, npred))
    for t in true_ids[1:]:
        tm = (true == t).astype(np.uint8)
        for p in np.unique(pred[tm > 0]):
            if p == 0:
                continue
            pm = (pred == p).astype(np.uint8)
            total = (tm + pm).sum()
            i = (tm * pm).sum()
            iou[t - 1, p - 1] = i / (total - i)
    if match_iou >= 0.5:
        iou2 = iou.copy()
        iou2[iou2 <= match_iou] = 0
        pt, pp = np.nonzero(iou2)
        pi = iou2[pt, pp]
        pt, pp = pt + 1, pp + 1
    else:
        pt0, pp0 = linear_sum_assignment(-iou)
        pi0 = iou[pt0, pp0]
        pt = pt0[pi0 > match_iou] + 1
        pp = pp0[pi0 > match_iou] + 1
        pi = pi0[pi0 > match_iou]
    ut = [i for i in true_ids[1:] if i not in list(pt)]
    up = [i for i in pred_ids[1:] if i not in list(pp)]
    tp, fp, fn = len(pt), len(up), len(ut)
    dq = tp / (tp + 0.5 * fp + 0.5 * fn)
    sq = pi.sum() / (tp + 1e-6)
    return dq, sq, dq * sq


def random_instances(rng, shape=(64, 64), n=6, r=(4, 10)):
    """Random disks labeled 1..n (later disks overwrite earlier ones)."""
    lab = np.zeros(shape, dtype=np.int32)
    hh, ww = np.mgrid[0:shape[0], 0:shape[1]]
    for k in range(1, n + 1):
        cy, cx = rng.randint(0, shape[0]), rng.randint(0, shape[1])
        rad = rng.randint(*r)
        lab[(hh - cy) ** 2 + (ww - cx) ** 2 <= rad * rad] = k
    return remap_label(lab)


# ---------------------------------------------------------------- tests
class TestAJI:
    def test_perfect_match(self, rng):
        t = random_instances(rng)
        aji, fp, fn, less, more = get_fast_aji(t, t.copy())
        assert aji == pytest.approx(1.0, abs=1e-9)

    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
    def test_matches_oracle(self, seed):
        rng = np.random.RandomState(seed)
        t = random_instances(rng, n=5)
        p = random_instances(rng, n=7)
        got = get_fast_aji(t, p)
        want = oracle_aji(t, p)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_split_instance_penalised(self, rng):
        # one GT disk predicted as two halves -> AJI < 1 (1-to-many pairing)
        t = np.zeros((32, 32), np.int32)
        t[8:24, 8:24] = 1
        p = np.zeros_like(t)
        p[8:24, 8:16] = 1
        p[8:24, 16:24] = 2
        aji = get_fast_aji(t, p)[0]
        assert 0 < aji < 1


class TestPQ:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    @pytest.mark.parametrize("match_iou", [0.5, 0.3])
    def test_matches_oracle(self, seed, match_iou):
        rng = np.random.RandomState(seed)
        t = random_instances(rng, n=5)
        p = random_instances(rng, n=6)
        got = get_fast_pq(t, p, match_iou)[0]
        want = oracle_pq(t, p, match_iou)
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_perfect(self, rng):
        t = random_instances(rng)
        [dq, sq, pq], _ = get_fast_pq(t, t.copy())
        assert dq == pytest.approx(1.0)
        assert sq == pytest.approx(1.0, abs=1e-6)


class TestDice:
    def test_dice1(self):
        t = np.zeros((16, 16), np.int32)
        p = np.zeros_like(t)
        t[:8] = 1
        p[4:12] = 3
        # fg overlap 4 rows, |t|=|p|=8 rows
        assert get_dice_1(t, p) == pytest.approx(0.5)

    def test_fast_dice2_oracle(self, rng):
        t = random_instances(rng, n=4)
        p = random_instances(rng, n=5)
        # oracle: loop form of stats_utils.py:279-317
        ot = oi = 0
        for ti in np.unique(t)[1:]:
            tm = (t == ti).astype(np.uint8)
            for pi in np.unique(p[tm > 0]):
                if pi == 0:
                    continue
                pm = (p == pi).astype(np.uint8)
                ot += (tm + pm).sum()
                oi += (tm * pm).sum()
        assert get_fast_dice_2(t, p) == pytest.approx(2 * oi / ot)


class TestRemap:
    def test_contiguous(self):
        x = np.array([[0, 2, 2], [0, 7, 7], [4, 4, 0]])
        y = remap_label(x)
        assert sorted(np.unique(y)) == [0, 1, 2, 3]
        # order of first appearance of sorted unique ids preserved
        assert y[0, 1] == 1 and y[2, 0] == 2 and y[1, 1] == 3

    def test_by_size(self):
        x = np.zeros((8, 8), np.int32)
        x[0, 0] = 5          # size 1
        x[4:8, 4:8] = 3      # size 16
        y = remap_label(x, by_size=True)
        assert y[4, 4] == 1 and y[0, 0] == 2


class TestPixel:
    def test_perfect(self):
        lab = np.zeros((2, 8, 8), np.int32)
        lab[:, 2:6, 2:6] = 1
        res = accuracy_pixel_level(lab, lab)
        assert res[0] == pytest.approx(1.0, abs=1e-6)   # acc
        assert res[1] == pytest.approx(1.0, abs=1e-6)   # iou

    def test_half_overlap(self):
        pred = np.zeros((1, 4, 4), np.int32)
        targ = np.zeros((1, 4, 4), np.int32)
        pred[0, :2] = 1      # 8 px
        targ[0, 1:3] = 1     # 8 px, overlap 4
        acc, iou, recall, precision, f1, perf = accuracy_pixel_level(pred, targ)
        assert iou == pytest.approx(4 / 12, abs=1e-6)
        assert recall == pytest.approx(0.5, abs=1e-6)
        assert precision == pytest.approx(0.5, abs=1e-6)


class TestPairCoordinatesShape:
    def test_zero_matches_keeps_2d_pairing(self):
        """A zero-match image must return pairing shape (0, 2) — the
        reference's np.array(list(zip(...))) collapses to (0,) and crashes
        callers indexing pairing[:, 0] (stats_utils.py:434)."""
        from cdnet_tpu.metrics.instance import pair_coordinates
        p, ua, ub = pair_coordinates(np.array([[0.0, 0.0]]),
                                     np.array([[100.0, 100.0]]), 5.0)
        assert p.shape == (0, 2)
        assert p[:, 0].shape == (0,)
        assert list(ua) == [0] and list(ub) == [0]


class TestUNetWeightMap:
    def test_single_instance_no_phantom_ridge(self):
        """U-Net eq. 2: with ONE instance, d2 = +inf and the ridge term
        vanishes (a zero d2 fabricated a maximal ridge around every
        isolated nucleus)."""
        from cdnet_tpu.data.weight_maps import unet_weight_map
        lab = np.zeros((16, 16), np.int32)
        lab[4:8, 4:8] = 1
        w = unet_weight_map(lab)
        np.testing.assert_allclose(w, 1.0, atol=1e-6)

    def test_running_two_smallest_matches_stacked(self):
        """The O(H*W)-memory running reduction must equal the stacked
        per-instance EDT formulation."""
        from scipy.ndimage import distance_transform_edt

        from cdnet_tpu.data.weight_maps import unet_weight_map
        rng = np.random.RandomState(0)
        lab = np.zeros((48, 48), np.int32)
        for k, (y, x) in enumerate(rng.randint(6, 42, (6, 2)), 1):
            lab[y - 3:y + 3, x - 3:x + 3] = k
        ids = np.unique(lab); ids = ids[ids != 0]
        dists = np.stack([distance_transform_edt(lab != k) for k in ids])
        part = np.partition(dists, 1, axis=0)
        want = 1.0 + 10.0 * np.exp(-((part[0] + part[1]) ** 2) / 50.0) * (lab == 0)
        np.testing.assert_allclose(unet_weight_map(lab),
                                   want.astype(np.float32), rtol=1e-6)
