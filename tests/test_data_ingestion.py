"""Real-data ingestion round-trips — the seam that makes real datasets work
the day they appear in this zero-egress environment (VERDICT r2 §missing).

Each test WRITES a miniature on-disk dataset in the standard layout (CIFAR
python pickles + .tar.gz, an ImageFolder tree of real JPEGs, a VOCdevkit
Annotations/JPEGImages/ImageSets tree) into tmpdir, then round-trips it
through the real parsers — no synthetic shortcut, no network. The CIFAR
path additionally drives a 2-step jitted train on the loaded arrays.

Reference loaders being matched: ``cifar100_ab5_param_budgets.py:107-162``
(torchvision CIFAR pickles), ``imagenet_ab_param_budgets.py:103-149``
(ImageFolder), ``voc_localization_vit.py:49-105`` (VOCdevkit XML).
"""

import os
import pickle
import tarfile

import jax
import numpy as np
import optax
import pytest

from mop_tpu.data.cifar import (BatchIterator, has_real_data, load_cifar,
                                train_val_split)
from mop_tpu.data.imagenet import has_imagefolder, load_imagefolder
from mop_tpu.data.voc import has_real_voc, load_voc_boxes


def _rand_imgs(rng, n):
    return rng.randint(0, 256, (n, 3 * 32 * 32), dtype=np.int64).astype(np.uint8)


def _write_cifar10(root, n_per_batch=4, n_test=6, seed=0):
    """Standard cifar-10-batches-py layout: 5 train pickles + test_batch,
    'data' as (N, 3072) uint8 row-major CHW, 'labels' as a python list."""
    rng = np.random.RandomState(seed)
    d = os.path.join(root, "cifar-10-batches-py")
    os.makedirs(d, exist_ok=True)
    all_x, all_y = [], []
    for i in range(1, 6):
        x = _rand_imgs(rng, n_per_batch)
        y = rng.randint(0, 10, n_per_batch).tolist()
        all_x.append(x)
        all_y.extend(y)
        with open(os.path.join(d, f"data_batch_{i}"), "wb") as f:
            pickle.dump({"data": x, "labels": y}, f)
    tx = _rand_imgs(rng, n_test)
    ty = rng.randint(0, 10, n_test).tolist()
    with open(os.path.join(d, "test_batch"), "wb") as f:
        pickle.dump({"data": tx, "labels": ty}, f)
    return (np.concatenate(all_x).reshape(-1, 3, 32, 32),
            np.asarray(all_y, np.int32),
            tx.reshape(-1, 3, 32, 32), np.asarray(ty, np.int32))


def _write_cifar100(root, n_train=20, n_test=8, seed=1):
    rng = np.random.RandomState(seed)
    d = os.path.join(root, "cifar-100-python")
    os.makedirs(d, exist_ok=True)
    x = _rand_imgs(rng, n_train)
    y = rng.randint(0, 100, n_train).tolist()
    with open(os.path.join(d, "train"), "wb") as f:
        pickle.dump({"data": x, "fine_labels": y}, f)
    tx = _rand_imgs(rng, n_test)
    ty = rng.randint(0, 100, n_test).tolist()
    with open(os.path.join(d, "test"), "wb") as f:
        pickle.dump({"data": tx, "fine_labels": ty}, f)
    return (x.reshape(-1, 3, 32, 32), np.asarray(y, np.int32),
            tx.reshape(-1, 3, 32, 32), np.asarray(ty, np.int32))


def test_cifar10_pickles_round_trip(tmp_path):
    root = str(tmp_path)
    ex, ey, etx, ety = _write_cifar10(root)
    assert has_real_data("cifar10", root)
    x, y, tx, ty = load_cifar("cifar10", root=root)
    np.testing.assert_array_equal(x, ex)
    np.testing.assert_array_equal(y, ey)
    np.testing.assert_array_equal(tx, etx)
    np.testing.assert_array_equal(ty, ety)
    assert x.dtype == np.uint8 and y.dtype == np.int32
    assert x.shape[1:] == (3, 32, 32)


def test_cifar100_pickles_round_trip(tmp_path):
    root = str(tmp_path)
    ex, ey, etx, ety = _write_cifar100(root)
    assert has_real_data("cifar100", root)
    x, y, tx, ty = load_cifar("cifar100", root=root)
    np.testing.assert_array_equal(x, ex)
    np.testing.assert_array_equal(y, ey)
    np.testing.assert_array_equal(tx, etx)
    np.testing.assert_array_equal(ty, ety)
    assert int(y.max()) < 100


@pytest.mark.parametrize("name", ["cifar10", "cifar100"])
def test_cifar_targz_auto_extract(tmp_path, name):
    """Only the .tar.gz present (the torchvision download artifact): the
    loader must extract and parse it."""
    stage = tmp_path / "stage"
    stage.mkdir()
    if name == "cifar10":
        ex, ey, _, _ = _write_cifar10(str(stage))
        member, tar = "cifar-10-batches-py", "cifar-10-python.tar.gz"
    else:
        ex, ey, _, _ = _write_cifar100(str(stage))
        member, tar = "cifar-100-python", "cifar-100-python.tar.gz"
    root = tmp_path / "root"
    root.mkdir()
    with tarfile.open(root / tar, "w:gz") as t:
        t.add(stage / member, arcname=member)
    assert not (root / member).exists()
    assert has_real_data(name, str(root))  # triggers extraction
    x, y, _, _ = load_cifar(name, root=str(root))
    np.testing.assert_array_equal(x, ex)
    np.testing.assert_array_equal(y, ey)


def test_cifar_synthetic_not_used_when_real_present(tmp_path):
    """Real pickles win over the synthetic fallback (allow_synthetic=True)."""
    root = str(tmp_path)
    ex, _, _, _ = _write_cifar10(root)
    x, _, _, _ = load_cifar("cifar10", root=root, allow_synthetic=True)
    np.testing.assert_array_equal(x, ex)


def test_cifar_missing_and_synthetic_disabled_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_cifar("cifar10", root=str(tmp_path / "nope"),
                   allow_synthetic=False)


def test_two_step_train_on_loaded_cifar(tmp_path):
    """End-to-end: parse real-layout pickles -> split -> iterate -> 2 jitted
    train steps on the result (the full real-data plumbing, no synthetic)."""
    from mop_tpu.models import ViT_Baseline
    from mop_tpu.parallel import make_mesh
    from mop_tpu.parallel.train_step import make_classifier_train_step

    root = str(tmp_path)
    _write_cifar10(root, n_per_batch=8, n_test=8)
    x, y, _, _ = load_cifar("cifar10", root=root)
    trx, tr_y, vax, va_y = train_val_split(x, y, val_frac=0.25)
    assert len(trx) + len(vax) == len(x)
    it = BatchIterator(trx, tr_y, batch=8, seed=0)

    model = ViT_Baseline(n_classes=10, dim=32, depth=1, heads=2)
    mesh = make_mesh(n_devices=1)
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng, "dropout": rng},
        np.zeros((2, 3, 32, 32), np.float32), train=True)
    tx = optax.adamw(1e-3)
    opt = tx.init(params)
    step = make_classifier_train_step(
        model, tx, mesh, mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25),
        compute_dtype=None)
    losses = []
    for i in range(2):
        xb, yb = next(it)
        params, opt, m = step(params, opt, xb, yb, jax.random.fold_in(rng, i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)


def _write_imagefolder(root, split="train", n_per_class=3, size=40):
    from PIL import Image

    rng = np.random.RandomState(0)
    classes = ["ant", "bee"]
    originals = {}
    for cls in classes:
        d = os.path.join(root, split, cls)
        os.makedirs(d, exist_ok=True)
        for j in range(n_per_class):
            arr = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
            Image.fromarray(arr).save(os.path.join(d, f"img_{j}.jpg"),
                                      quality=95)
            originals[(cls, j)] = arr
    return classes, originals


def test_imagefolder_round_trip(tmp_path):
    root = str(tmp_path)
    classes, _ = _write_imagefolder(root)
    assert has_imagefolder(root, "train")
    x, y, found = load_imagefolder(root, "train", img_size=32)
    assert found == sorted(classes)
    assert x.shape == (6, 3, 32, 32) and x.dtype == np.uint8
    np.testing.assert_array_equal(np.unique(y), [0, 1])
    # labels follow sorted class order: first 3 files are class 0
    np.testing.assert_array_equal(y, [0, 0, 0, 1, 1, 1])


def test_imagefolder_limit_per_class(tmp_path):
    root = str(tmp_path)
    _write_imagefolder(root)
    x, y, _ = load_imagefolder(root, "train", img_size=32, limit_per_class=2)
    assert x.shape[0] == 4
    np.testing.assert_array_equal(y, [0, 0, 1, 1])


def _write_voc(root, year="2007", n=4, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    d = os.path.join(root, f"VOCdevkit/VOC{year}")
    for sub in ("Annotations", "JPEGImages", "ImageSets/Main"):
        os.makedirs(os.path.join(d, sub), exist_ok=True)
    ids, boxes = [], []
    for i in range(n):
        iid = f"{2007000 + i:06d}"
        w, h = int(rng.randint(60, 120)), int(rng.randint(60, 120))
        arr = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(
            os.path.join(d, "JPEGImages", f"{iid}.jpg"))
        # two objects; the larger one must be selected
        x0, y0 = rng.uniform(0, 0.3) * w, rng.uniform(0, 0.3) * h
        x1, y1 = min(w, x0 + 0.6 * w), min(h, y0 + 0.6 * h)
        sx0, sy0, sx1, sy1 = x0 + 2, y0 + 2, x0 + 6, y0 + 6  # small decoy
        objs = ""
        for (a, b, c, dd) in [(sx0, sy0, sx1, sy1), (x0, y0, x1, y1)]:
            objs += (
                "<object><name>thing</name><bndbox>"
                f"<xmin>{a:.1f}</xmin><ymin>{b:.1f}</ymin>"
                f"<xmax>{c:.1f}</xmax><ymax>{dd:.1f}</ymax>"
                "</bndbox></object>")
        xml = (f"<annotation><size><width>{w}</width><height>{h}</height>"
               f"<depth>3</depth></size>{objs}</annotation>")
        with open(os.path.join(d, "Annotations", f"{iid}.xml"), "w") as f:
            f.write(xml)
        ids.append(iid)
        boxes.append([x0 / w, y0 / h, x1 / w, y1 / h])
    with open(os.path.join(d, "ImageSets/Main", "train.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")
    return ids, np.asarray(boxes, np.float32)


def test_voc_round_trip_largest_box(tmp_path):
    root = str(tmp_path)
    ids, expected = _write_voc(root)
    assert has_real_voc(root)
    x, y = load_voc_boxes(root, split="train", img_size=64)
    assert x.shape == (len(ids), 3, 64, 64) and x.dtype == np.uint8
    assert y.shape == (len(ids), 4)
    # XML writes coordinates with one decimal -> up to 0.05px rounding per
    # axis on 60-120px images
    np.testing.assert_allclose(y, expected, atol=2e-3)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_voc_limit(tmp_path):
    root = str(tmp_path)
    _write_voc(root, n=5)
    x, y = load_voc_boxes(root, split="train", img_size=32, limit=2)
    assert x.shape[0] == 2


def test_download_flag_prefers_local_and_degrades_gracefully(tmp_path, monkeypatch):
    """--download must (a) use pre-placed pickles without touching the
    network, (b) fall back to synthetic when the fetch fails (zero-egress)."""
    import mop_tpu.data.cifar as cif

    root = str(tmp_path)
    ex, _, _, _ = _write_cifar10(root)
    called = []
    monkeypatch.setattr(
        "urllib.request.urlretrieve",
        lambda *a, **k: called.append(a) or (_ for _ in ()).throw(
            RuntimeError("no egress")))
    x, _, _, _ = cif.load_cifar("cifar10", root=root, download=True)
    np.testing.assert_array_equal(x, ex)
    assert not called  # data present -> no network attempt

    empty = str(tmp_path / "empty")
    x2, _, _, _ = cif.load_cifar("cifar10", root=empty, download=True,
                                 allow_synthetic=True, synthetic_train=64,
                                 synthetic_test=16)
    assert len(called) == 1  # attempted once, failed, fell back
    assert x2.shape[0] == 64
