"""TESTERS registry parity (pointcept/engines/test.py semantics)."""
import numpy as np

from lidar_layout_tpu.train.tester import (TESTERS, ClsTester, ReconTester,
                                           SemSegTester)


def test_registry_contents():
    for name in ("SemSegTester", "ClsTester", "ReconTester"):
        assert name in TESTERS


class TestSemSeg:
    def test_perfect_prediction(self):
        n, c = 50, 4
        labels = np.random.default_rng(0).integers(0, c, n)
        logits = np.eye(c)[labels] * 10.0
        t = SemSegTester(lambda b: logits, num_classes=c)
        out = t.test([{"label": labels}])
        assert out["mIoU"] == 1.0 and out["allAcc"] == 1.0

    def test_ignore_index_and_mask(self):
        c = 3
        labels = np.asarray([0, 1, 2, -1, 0])
        mask = np.asarray([1, 1, 1, 1, 0], bool)
        logits = np.eye(c)[[0, 1, 0, 0, 1]] * 5.0  # 3rd point wrong, rest right
        t = SemSegTester(lambda b: logits, num_classes=c)
        out = t.test([{"label": labels, "mask": mask}])
        # points -1 and masked-out are excluded: 2/3 correct
        assert abs(out["allAcc"] - 2 / 3) < 1e-6
        # class 2 fully missed -> IoU 0; classes 0 (1 hit 1 fp of itself) ...
        assert out["mIoU"] < 1.0

    def test_accumulates_over_batches(self):
        c = 2
        t = SemSegTester(lambda b: np.eye(c)[b["label"]], num_classes=c)
        out = t.test([{"label": np.asarray([0, 1])},
                      {"label": np.asarray([1, 1])}])
        assert out["allAcc"] == 1.0 and out["mIoU"] == 1.0


class TestCls:
    def test_per_class_accuracy(self):
        labels = np.asarray([0, 0, 1, 1])
        preds = np.asarray([0, 1, 1, 1])  # class 0: 50%, class 1: 100%
        logits = np.eye(2)[preds]
        t = ClsTester(lambda b: logits, num_classes=2)
        out = t.test([{"label": labels}])
        assert abs(out["mAcc"] - 0.75) < 1e-6
        assert abs(out["allAcc"] - 0.75) < 1e-6


class TestRecon:
    def test_psnr_of_identity(self):
        x = np.random.default_rng(1).uniform(-1, 1, (2, 4, 8, 1))
        t = ReconTester(lambda b: b["image"])
        out = t.test([{"image": x}])
        assert out["mae"] < 1e-9 and out["psnr"] > 100
