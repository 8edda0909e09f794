import os

import numpy as np
import pytest
from PIL import Image

from apvt_lora.data import (Loader, MetadataIndex, create_adv_metadata,
                            read_metadata, save_images)
from apvt_lora.data.synthetic import make_synthetic_dataset
from apvt_lora.data.transforms import eval_transform_pil
from apvt_lora.utils.vocab import LabelVocabulary


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synth"))
    frames = make_synthetic_dataset(root, n_per_class=4, image_size=32)
    return root, frames


def test_synthetic_contract(dataset):
    root, frames = dataset
    for split in ("train", "val", "test"):
        meta = read_metadata(os.path.join(root, split, "metadata.csv"))
        assert list(meta.columns) == ["image_path", "source", "original_class",
                                      "unified_class"]
        assert len(meta) == 5 * 4
        first = os.path.join(root, split, meta.iloc[0]["image_path"])
        assert os.path.exists(first)


def test_loader_batches_and_padding(dataset):
    root, _ = dataset
    vocab = LabelVocabulary.load_or_build = None  # noqa - clarity below
    meta_path = os.path.join(root, "train", "metadata.csv")
    vocab = LabelVocabulary.from_metadata_frames([read_metadata(meta_path)])
    index = MetadataIndex(meta_path, vocab, root_dir=os.path.join(root, "train"))
    assert len(index) == 20

    loader = Loader(index, batch_size=8, image_size=32, resize=36)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0].images.shape == (8, 32, 32, 3)
    assert batches[0].images.dtype == np.uint8
    # final batch padded: 20 = 8+8+4
    assert batches[2].valid.tolist() == [1, 1, 1, 1, 0, 0, 0, 0]
    assert len(batches[2].filenames) == 4
    labels = np.concatenate([b.labels[b.valid > 0] for b in batches])
    assert sorted(np.bincount(labels).tolist()) == [4, 4, 4, 4, 4]


def test_loader_shuffle_deterministic(dataset):
    root, _ = dataset
    meta_path = os.path.join(root, "train", "metadata.csv")
    vocab = LabelVocabulary.from_metadata_frames([read_metadata(meta_path)])
    index = MetadataIndex(meta_path, vocab, root_dir=os.path.join(root, "train"))
    l1 = Loader(index, batch_size=20, image_size=32, shuffle=True, seed=3)
    l2 = Loader(index, batch_size=20, image_size=32, shuffle=True, seed=3)
    b1, b2 = next(iter(l1)), next(iter(l2))
    assert b1.filenames == b2.filenames
    b1b = next(iter(l1))  # second epoch reshuffles
    assert b1b.filenames != b1.filenames


def test_loader_native_backend_matches_pil(dataset):
    """decode_backend='native' routes resize/crop through the C++ library and
    must agree with the PIL path to <=2 uint8 LSB per pixel."""
    from apvt_lora.utils import native

    if not native.available():
        pytest.skip("native library unavailable")
    root, _ = dataset
    meta_path = os.path.join(root, "train", "metadata.csv")
    vocab = LabelVocabulary.from_metadata_frames([read_metadata(meta_path)])
    index = MetadataIndex(meta_path, vocab, root_dir=os.path.join(root, "train"))
    b_nat = next(iter(Loader(index, batch_size=20, image_size=28, resize=32,
                             decode_backend="native")))
    b_pil = next(iter(Loader(index, batch_size=20, image_size=28, resize=32,
                             decode_backend="pil")))
    diff = np.abs(b_nat.images.astype(int) - b_pil.images.astype(int))
    assert diff.max() <= 2


def test_loader_throughput_feeds_device(tmp_path):
    """Host decode path must outpace the device's PGD appetite (~158 imgs/s
    per chip at batch 64, BENCH) with real PNG decode + 224px resize/crop."""
    import time

    import pandas as pd

    rng = np.random.default_rng(0)
    n = 128
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rows = []
    yy, xx = np.mgrid[0:256, 0:320]
    for i in range(n):
        # structured scene (gradient + blocks + mild noise): decodes like a
        # real photo, not like an incompressible noise PNG
        arr = np.stack([(yy + i) % 256, (xx * 2) % 256,
                        ((yy + xx) // 2) % 256], -1).astype(np.uint8)
        arr[64:160, 96:224] = rng.integers(0, 255, 3, dtype=np.uint8)
        arr = np.clip(arr + rng.integers(0, 8, arr.shape, dtype=np.uint8), 0, 255)
        name = f"img_{i}.png"
        Image.fromarray(arr).save(img_dir / name)
        rows.append({"image_path": f"imgs/{name}", "source": "synth",
                     "original_class": "a", "unified_class": "a"})
    meta = tmp_path / "metadata.csv"
    pd.DataFrame(rows).to_csv(meta, index=False)

    if os.getloadavg()[0] > 1.5:
        pytest.skip("host CPU busy (1-core machine) — throughput floor "
                    "would measure the contention, not the loader")
    vocab = LabelVocabulary(["a"])
    index = MetadataIndex(str(meta), vocab, root_dir=str(tmp_path))
    loader = Loader(index, batch_size=64, image_size=224, resize=256)
    next(iter(loader))  # warm the thread pool / page cache
    ips = 0.0
    for _ in range(3):  # best-of-3: absorbs transient scheduler noise
        t0 = time.perf_counter()
        total = sum(int(b.valid.sum()) for b in loader)
        ips = max(ips, total / (time.perf_counter() - t0))
        assert total == n
        if ips > 300:
            break
    # device appetite is ~158 imgs/s/chip (bench.py, packed fused attention);
    # the native fused PNG-decode path measures ~546 imgs/s on this host's
    # one core — assert a ~2x appetite margin with headroom for host noise
    assert ips > 300, f"host decode path too slow: {ips:.0f} imgs/s"


def test_save_images_roundtrip(tmp_path):
    """PNG writer quantization parity (Utils.py:106-113 semantics): pixels
    round-trip exactly as floor(x*255) uint8."""
    imgs = np.random.default_rng(0).random((3, 16, 16, 3)).astype(np.float32)
    names = [f"x_{i}.png" for i in range(3)]
    save_images(imgs, names, str(tmp_path))
    for i, n in enumerate(names):
        arr = np.asarray(Image.open(tmp_path / n))
        np.testing.assert_array_equal(arr, (imgs[i] * 255).astype(np.uint8))


def test_create_adv_metadata(dataset, tmp_path):
    root, frames = dataset
    meta_path = os.path.join(root, "test", "metadata.csv")
    df = read_metadata(meta_path)
    chosen = [os.path.basename(p) for p in df["image_path"][:3]]
    adv = create_adv_metadata(meta_path, chosen, "/adv/pgd/images")
    assert len(adv) == 3
    assert all(p.startswith("/adv/pgd/images/") for p in adv["image_path"])
    assert list(adv.columns) == list(df.columns)


def test_eval_transform_nonsquare():
    img = Image.fromarray(np.zeros((100, 60, 3), np.uint8))
    out = eval_transform_pil(img, resize=64, crop=48)
    assert out.shape == (48, 48, 3)


def test_loader_corrupt_image_raises_not_hangs(tmp_path):
    """A truncated PNG mid-epoch must surface as an exception in the
    consumer, not kill the producer thread and hang q.get() forever
    (review finding)."""
    import numpy as np
    import pandas as pd
    from PIL import Image

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img_dir / "ok.png")
    (img_dir / "bad.png").write_bytes(b"\x89PNG\r\n\x1a\nnot a real png")
    meta = pd.DataFrame([
        {"image_path": "images/ok.png", "source": "s",
         "original_class": "a", "unified_class": "a"},
        {"image_path": "images/bad.png", "source": "s",
         "original_class": "a", "unified_class": "a"},
    ])
    meta.to_csv(tmp_path / "metadata.csv", index=False)

    vocab = LabelVocabulary.from_classes(["a"])
    idx = MetadataIndex(str(tmp_path / "metadata.csv"), vocab)
    loader = Loader(idx, batch_size=2, image_size=16, resize=16)
    with pytest.raises(Exception):
        for _ in loader:
            pass


def test_loader_early_break_shuts_down(tmp_path):
    """Breaking out of iteration early must release the producer (no thread
    stuck in q.put on a full queue)."""
    import threading

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import synthetic
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

    synthetic.make_synthetic_dataset(str(tmp_path), n_per_class=8,
                                     image_size=16, splits=("train",))
    vocab = LabelVocabulary.from_classes(synthetic.DEFAULT_CLASSES)
    idx = MetadataIndex(str(tmp_path / "train" / "metadata.csv"), vocab)
    loader = Loader(idx, batch_size=2, image_size=16, resize=16, prefetch=1)

    before = threading.active_count()
    for i, _ in enumerate(loader):
        if i == 0:
            break
    # the daemon producer observes stop and exits promptly
    import time

    for _ in range(50):
        if threading.active_count() <= before:
            break
        time.sleep(0.1)
    assert threading.active_count() <= before + 1


def test_create_adv_metadata_duplicate_basenames(tmp_path):
    """Duplicate basenames across class dirs (GTSRB track/frame stems) must
    not collapse onto one PNG: each written file is consumed by exactly one
    clean row, in row order (round-3 review finding)."""
    import pandas as pd

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data import io as data_io

    clean = pd.DataFrame({
        "image_path": ["images/stop/0001.png", "images/yield/0001.png",
                       "images/stop/0002.png"],
        "unified_class": ["stop", "yield", "stop"],
    })
    # writer disambiguated the second 0001.png to 0001__1.png
    written = ["0001.png", "0001__1.png", "0002.png"]
    origs = ["0001.png", "0001.png", "0002.png"]
    adv = data_io.create_adv_metadata(clean, written, "/adv", originals=origs)
    assert list(adv["image_path"]) == ["/adv/0001.png", "/adv/0001__1.png",
                                       "/adv/0002.png"]
    assert list(adv["unified_class"]) == ["stop", "yield", "stop"]

    # without originals (no duplicates) behavior is unchanged
    adv2 = data_io.create_adv_metadata(clean.iloc[2:], ["0002.png"], "/adv")
    assert list(adv2["image_path"]) == ["/adv/0002.png"]


def test_generate_split_disambiguates_duplicate_names(tmp_path):
    """End-to-end: two rows with the same basename produce two distinct
    adversarial PNGs and two metadata rows with correct labels."""
    import jax.numpy as jnp
    import pandas as pd

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import generate
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

    rows = []
    for cls in ("stop", "yield"):
        d = tmp_path / "images" / cls
        d.mkdir(parents=True)
        arr = np.full((16, 16, 3), 60 if cls == "stop" else 200, np.uint8)
        Image.fromarray(arr).save(d / "0001.png")
        rows.append({"image_path": str(d / "0001.png"), "unified_class": cls})
    meta = pd.DataFrame(rows)
    vocab = LabelVocabulary(("stop", "yield"))
    idx = MetadataIndex(meta, vocab, root_dir=str(tmp_path))
    loader = Loader(idx, batch_size=2, image_size=16, resize=16)

    identity = lambda p, im, lb, r: jnp.asarray(im, jnp.float32) / (
        255.0 if im.dtype == jnp.uint8 else 1.0)
    out = tmp_path / "adv"
    adv_meta = generate.generate_adversarial_split(
        identity, None, loader, out_dir=str(out), clean_metadata=meta)
    names = sorted(os.listdir(out / "images"))
    assert names == ["0001.png", "0001__1.png"]
    assert len(adv_meta) == 2
    assert list(adv_meta["unified_class"]) == ["stop", "yield"]
    # labels stayed attached to the right pixels: stop row decodes dark
    a0 = np.asarray(Image.open(adv_meta.iloc[0]["image_path"]))
    a1 = np.asarray(Image.open(adv_meta.iloc[1]["image_path"]))
    assert a0.mean() < 120 < a1.mean()


def test_cached_loader_replays_identical_batches(tmp_path):
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import (
        CachedLoader, Loader, MetadataIndex)
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary
    import pandas as pd

    d = tmp_path / "imgs"
    d.mkdir()
    rows = []
    for i in range(5):
        Image.fromarray(np.full((16, 16, 3), 40 * i, np.uint8)).save(
            d / f"{i}.png")
        rows.append({"image_path": str(d / f"{i}.png"),
                     "unified_class": "stop"})
    vocab = LabelVocabulary(("stop",))
    idx = MetadataIndex(pd.DataFrame(rows), vocab, root_dir=str(tmp_path))
    loader = Loader(idx, batch_size=2, image_size=16, resize=16)

    decodes = {"n": 0}
    orig = Loader._decode

    def counting(self, i):
        decodes["n"] += 1
        return orig(self, i)

    Loader._decode = counting
    try:
        cl = CachedLoader(loader)
        first = [(b.images.copy(), b.labels.copy(), b.valid.copy())
                 for b in cl]
        n_after_first = decodes["n"]
        second = [(b.images, b.labels, b.valid) for b in cl]
    finally:
        Loader._decode = orig
    assert decodes["n"] == n_after_first  # replay decodes nothing
    assert len(first) == len(second) == len(cl)
    for (i1, l1, v1), (i2, l2, v2) in zip(first, second):
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(l1, l2)
        np.testing.assert_array_equal(v1, v2)

    # shuffled loaders must NOT cache (replay would freeze the epoch order)
    sl = Loader(idx, batch_size=2, image_size=16, resize=16, shuffle=True)
    assert CachedLoader(sl)._cache is None


def test_generate_pairs_rows_despite_skipped_duplicate(tmp_path):
    """A metadata row whose image file is MISSING shares its basename with a
    later, present row of a different class: the adversarial metadata must
    carry the present row's class (index-based pairing), not the skipped
    row's (the old basename matching consumed the written file for the
    wrong row)."""
    import jax.numpy as jnp
    import pandas as pd

    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.attacks import generate
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.data.loader import Loader, MetadataIndex
    from adapting_pretrained_vision_transformers_with_lora_against_attack_vectors_tpu.utils.vocab import LabelVocabulary

    d = tmp_path / "images" / "yield"
    d.mkdir(parents=True)
    Image.fromarray(np.full((16, 16, 3), 200, np.uint8)).save(d / "a.png")
    meta = pd.DataFrame([
        {"image_path": str(tmp_path / "images" / "stop" / "a.png"),  # absent
         "unified_class": "stop"},
        {"image_path": str(d / "a.png"), "unified_class": "yield"},
    ])
    vocab = LabelVocabulary(("stop", "yield"))
    idx = MetadataIndex(meta, vocab, root_dir=str(tmp_path))
    assert len(idx) == 1  # the stop row was skipped (missing file)
    loader = Loader(idx, batch_size=2, image_size=16, resize=16)

    identity = lambda p, im, lb, r: jnp.asarray(im, jnp.float32) / 255.0
    adv_meta = generate.generate_adversarial_split(
        identity, None, loader, out_dir=str(tmp_path / "adv"),
        clean_metadata=meta)
    assert len(adv_meta) == 1
    assert adv_meta.iloc[0]["unified_class"] == "yield"


def test_synthetic_hard_style(tmp_path):
    """--style hard: 12 glyph-coded classes, same filesystem contract,
    deterministic renders, and the discriminative feature (bar-count glyph)
    is present — dark-pixel area increases monotonically with the glyph
    code within a shape group."""
    import numpy as np

    from apvt_lora.data import synthetic

    frames = synthetic.make_synthetic_dataset(
        str(tmp_path), n_per_class=2, image_size=64, style="hard")
    assert frames["train"].unified_class.nunique() == 12
    assert set(frames["train"].unified_class) == set(synthetic.HARD_CLASSES)

    # determinism: same seed renders identical pixels
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    a = synthetic._render_hard(5, rng1, 96)
    b = synthetic._render_hard(5, rng2, 96)
    np.testing.assert_array_equal(a, b)

    # glyph monotonicity within the circle group (codes 0..3)
    areas = []
    for code in range(4):
        img = synthetic._render_hard(code, np.random.default_rng(3), 224)
        areas.append(int((img < 80).all(-1).sum()))
    assert areas[0] < areas[1] < areas[2] < areas[3]
