import numpy as np

from amos_slam_tpu.models.eval import (
    evaluate_detections, box_iou, mask_iou, average_precision,
)


def test_box_iou_basic():
    a = np.array([[0, 0, 2, 2]], float)
    b = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], float)
    iou = box_iou(a, b)[0]
    np.testing.assert_allclose(iou, [1 / 7, 1.0, 0.0], atol=1e-6)


def test_perfect_detections_map_1():
    gt = [{"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float),
           "classes": np.array([0, 1])}]
    pred = [{"boxes": gt[0]["boxes"].copy(),
             "scores": np.array([0.9, 0.8]),
             "classes": np.array([0, 1])}]
    m = evaluate_detections(pred, gt)
    assert m["mAP"] > 0.99
    assert m["AP50"] > 0.99


def test_false_positives_lower_map():
    gt = [{"boxes": np.array([[0, 0, 10, 10]], float), "classes": np.array([0])}]
    pred = [{"boxes": np.array([[0, 0, 10, 10], [50, 50, 60, 60]], float),
             "scores": np.array([0.6, 0.9]),   # FP scored HIGHER
             "classes": np.array([0, 0])}]
    m = evaluate_detections(pred, gt)
    assert 0.3 < m["AP50"] < 0.9


def test_mask_map():
    H = W = 16
    g = np.zeros((1, H, W), bool)
    g[0, 2:10, 2:10] = True
    p_good = g.copy()
    p_half = np.zeros_like(g)
    p_half[0, 2:6, 2:10] = True
    gt = [{"classes": np.array([0]), "masks": g,
           "boxes": np.array([[2, 2, 10, 10]], float)}]
    pred_good = [{"classes": np.array([0]), "masks": p_good,
                  "scores": np.array([0.9]),
                  "boxes": np.array([[2, 2, 10, 10]], float)}]
    pred_half = [{"classes": np.array([0]), "masks": p_half,
                  "scores": np.array([0.9]),
                  "boxes": np.array([[2, 2, 10, 6]], float)}]
    m_good = evaluate_detections(pred_good, gt, iou_type="mask")
    m_half = evaluate_detections(pred_half, gt, iou_type="mask")
    assert m_good["mAP"] > 0.99
    assert m_half["mAP"] < m_good["mAP"]
