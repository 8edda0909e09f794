"""ETL tests: each raw-source parser against a synthetic fixture of its real
layout, plus the resize_with_padding geometry and the end-to-end driver."""

import csv
import json
import os
from pathlib import Path

import numpy as np
import pytest

from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import process


def _img(w, h, color=(40, 80, 200)):
    img = np.zeros((h, w, 3), np.uint8)
    img[:] = color
    return img


def test_resize_with_padding_geometry():
    out = process.resize_with_padding(_img(100, 50), (224, 224))
    assert out.shape == (224, 224, 3)
    # aspect-preserving: a 2:1 image fills width, pads height
    assert out[0, 112].sum() == 0 and out[223, 112].sum() == 0  # padded rows
    assert out[112, 112].sum() > 0  # center is image


def test_gtsrb_parser(tmp_path):
    base = tmp_path / "gtsrb-german-traffic-sign" / "versions" / "1"
    (base / "Train" / "14").mkdir(parents=True)
    process.imwrite(str(base / "Train" / "14" / "img0.png"), _img(80, 80))
    with open(base / "Train.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["Path", "ClassId", "Roi.X1", "Roi.Y1",
                                          "Roi.X2", "Roi.Y2"])
        w.writeheader()
        w.writerow({"Path": "Train/14/img0.png", "ClassId": "14",
                    "Roi.X1": 5, "Roi.Y1": 5, "Roi.X2": 75, "Roi.Y2": 75})
        w.writerow({"Path": "Train/14/missing.png", "ClassId": "14",
                    "Roi.X1": 0, "Roi.Y1": 0, "Roi.X2": 10, "Roi.Y2": 10})

    out = tmp_path / "out"
    recs = process.process_gtsrb(tmp_path / "gtsrb-german-traffic-sign", out,
                                 "train", log=lambda s: None)
    assert len(recs) == 1
    assert recs[0]["unified_class"] == "stop"  # class 14
    assert recs[0]["original_class"] == "Class_14"
    crop = process.imread(recs[0]["image_path"])
    assert crop.shape == (224, 224, 3)


def _write_yolo_fixture(base: Path, split: str, class_id: int):
    (base / split / "images").mkdir(parents=True)
    (base / split / "labels").mkdir(parents=True)
    process.imwrite(str(base / split / "images" / "a.png"), _img(200, 200))
    with open(base / split / "labels" / "a.txt", "w") as f:
        f.write(f"{class_id} 0.5 0.5 0.5 0.5\n")      # valid 100px box
        f.write(f"{class_id} 0.1 0.1 0.05 0.05\n")    # too small -> dropped
        f.write("999 0.5 0.5 0.5 0.5\n")              # unknown class -> dropped


def test_lisa_parser(tmp_path):
    base = tmp_path / "lisa-road-sign"
    _write_yolo_fixture(base, "train", 35)  # stop
    recs = process.process_lisa(base, tmp_path / "out", "train",
                                log=lambda s: None)
    assert len(recs) == 1
    assert recs[0]["unified_class"] == "stop"
    assert recs[0]["source"] == "lisa"


def test_roboflow_parser(tmp_path):
    base = tmp_path / "roboflow-traffic-signs-dataset"
    _write_yolo_fixture(base, "test", 22)  # Stop_Sign
    recs = process.process_roboflow(base, tmp_path / "out", "test",
                                    log=lambda s: None)
    assert len(recs) == 1
    assert recs[0]["unified_class"] == "stop"


def test_mapillary_parser(tmp_path):
    base = tmp_path / "Mapillary"
    ann_root = base / "mtsd_fully_annotated_annotation" / "mtsd_v2_fully_annotated"
    (ann_root / "splits").mkdir(parents=True)
    (ann_root / "annotations").mkdir(parents=True)
    img_dir = base / "mtsd_fully_annotated_images.val" / "images"
    img_dir.mkdir(parents=True)

    process.imwrite(str(img_dir / "key1.jpg"), _img(300, 300))
    with open(ann_root / "splits" / "val.txt", "w") as f:
        f.write("key1\n")
    ann = {"objects": [
        {"bbox": {"xmin": 10, "ymin": 10, "xmax": 200, "ymax": 200},
         "label": "regulatory--stop--g1"},
        {"bbox": {"xmin": 0, "ymin": 0, "xmax": 5, "ymax": 5},
         "label": "regulatory--stop--g1"},  # too small
        {"bbox": {"xmin": 10, "ymin": 10, "xmax": 100, "ymax": 100,
                  "cross_boundary": {}},
         "label": "regulatory--yield--g1"},  # cross-boundary -> dropped
    ]}
    with open(ann_root / "annotations" / "key1.json", "w") as f:
        json.dump(ann, f)

    recs = process.process_mapillary(base, tmp_path / "out", "val",
                                     log=lambda s: None)
    assert len(recs) == 1
    assert recs[0]["unified_class"] == "stop"
    assert recs[0]["source"] == "mapillary_fully"
    assert recs[0]["original_class"] == "regulatory--stop--g1"


def test_mapillary_speed_limit_digit_rule(tmp_path):
    # 'speed-limit-30' style types fold to speed-limit (Process.py:389-390)
    base = tmp_path / "Mapillary"
    ann_root = base / "mtsd_fully_annotated_annotation" / "mtsd_v2_fully_annotated"
    (ann_root / "splits").mkdir(parents=True)
    (ann_root / "annotations").mkdir(parents=True)
    img_dir = base / "mtsd_fully_annotated_images.val" / "images"
    img_dir.mkdir(parents=True)
    process.imwrite(str(img_dir / "k.jpg"), _img(300, 300))
    (ann_root / "splits" / "val.txt").write_text("k\n")
    with open(ann_root / "annotations" / "k.json", "w") as f:
        json.dump({"objects": [{"bbox": {"xmin": 0, "ymin": 0, "xmax": 100,
                                         "ymax": 100},
                                "label": "regulatory--speed-limit-30--g1"}]}, f)
    recs = process.process_mapillary(base, tmp_path / "out", "val",
                                     log=lambda s: None)
    assert recs[0]["unified_class"] == "speed_limit"


@pytest.mark.skipif(process._cv2() is None, reason="needs OpenCV video IO")
def test_cure_tsd_parser(tmp_path):
    cv2 = process._cv2()
    base = tmp_path / "CURE-TSD"
    (base / "data").mkdir(parents=True)
    (base / "labels").mkdir(parents=True)

    # 5-frame video, one stop sign on frame 2 (1-based)
    path = str(base / "data" / "01_01_00_00_00.mp4")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (160, 120))
    assert wr.isOpened()
    for i in range(5):
        wr.write(_img(160, 120, (i * 30, 100, 50)))
    wr.release()

    # annotation: frame 2, type 06 (stop), 4-corner coords
    with open(base / "labels" / "01_01.txt", "w") as f:
        f.write("header\n")
        f.write("2_06_10_10_110_10_110_90_10_90\n")
        f.write("2_99_10_10_110_10_110_90_10_90\n")  # 'other' -> dropped

    recs = process.process_cure_tsd(base, tmp_path / "out", "train",
                                    log=lambda s: None)
    assert len(recs) == 1
    assert recs[0]["unified_class"] == "stop"
    crop = process.imread(recs[0]["image_path"])
    assert crop.shape == (224, 224, 3)

    # the sequence split: 01_04 is a test sequence
    assert "01_01" not in process.CURE_TSD_TEST_SEQUENCES
    recs_test = process.process_cure_tsd(base, tmp_path / "out2", "test",
                                         log=lambda s: None)
    assert recs_test == []


def test_process_all_driver(tmp_path):
    base = tmp_path / "raw"
    _write_yolo_fixture(base / "lisa-road-sign", "train", 35)
    out = tmp_path / "processed"
    total = process.process_all(base, out, datasets=("lisa-road-sign",),
                                splits=("train",), log=lambda s: None)
    assert total == 1
    meta = out / "train" / "metadata.csv"
    assert meta.exists()
    with open(meta) as f:
        rows = list(csv.DictReader(f))
    assert rows[0]["unified_class"] == "stop"
    assert os.path.exists(rows[0]["image_path"])

    # ETL output feeds the loader (full contract round trip)
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

    vocab = LabelVocabulary.from_classes(["stop"])
    idx = MetadataIndex(str(meta), vocab)
    assert len(idx) == 1
    batch = next(iter(Loader(idx, batch_size=1)))
    assert batch.images.shape == (1, 224, 224, 3)


def test_imwrite_native_fallback(tmp_path, monkeypatch):
    """Without cv2, imwrite must route PNGs through the native encoder (and
    still produce BGR->RGB-correct, lossless files)."""
    from PIL import Image

    monkeypatch.setattr(process, "_cv2", lambda: None)
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
    path = tmp_path / "out.png"
    process.imwrite(str(path), rgb[..., ::-1])  # imwrite takes BGR
    back = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(back, rgb)
