"""Data layer: discovery, windowing collate, augmentation, CSV round trip."""

import os

import numpy as np
import pytest

from said_tpu.data.blendvoca import (
    BLENDSHAPE_CLASSES,
    BLENDSHAPE_MIRROR_PAIRS,
    BlendVOCATrainDataset,
    BlendVOCAVAEDataset,
    BlendVOCAValDataset,
    get_data_paths,
)
from said_tpu.utils.audio import save_audio
from said_tpu.utils.blendshape import (
    load_blendshape_coeffs,
    save_blendshape_coeffs,
)


@pytest.fixture(scope="module")
def toy_blendvoca(tmp_path_factory):
    """Small synthetic BlendVOCA tree: 2 train + 1 val subject, 3 sentences."""
    root = tmp_path_factory.mktemp("blendvoca")
    audio_dir = root / "audio"
    coeffs_dir = root / "blendshape_coeffs"
    rng = np.random.default_rng(0)
    subjects = [
        "FaceTalk_170725_00137_TA",
        "FaceTalk_170728_03272_TA",
        "FaceTalk_170811_03275_TA",
    ]
    for pid in subjects:
        (audio_dir / pid).mkdir(parents=True)
        (coeffs_dir / pid).mkdir(parents=True)
        for sid in [1, 2, 3]:
            n_frames = int(rng.integers(130, 200))
            wave = rng.standard_normal(n_frames * 16000 // 60).astype(np.float32) * 0.1
            save_audio(str(audio_dir / pid / f"sentence{sid:02}.wav"), wave, 16000)
            coeffs = rng.uniform(0, 1, (n_frames, 32)).astype(np.float32)
            save_blendshape_coeffs(
                coeffs, BLENDSHAPE_CLASSES, str(coeffs_dir / pid / f"sentence{sid:02}.csv")
            )
    return str(audio_dir), str(coeffs_dir)


def test_csv_round_trip(tmp_path):
    rng = np.random.default_rng(1)
    coeffs = rng.uniform(0, 1, (40, 32)).astype(np.float32)
    path = str(tmp_path / "c.csv")
    save_blendshape_coeffs(coeffs, BLENDSHAPE_CLASSES, path)
    loaded = load_blendshape_coeffs(path)
    np.testing.assert_allclose(loaded, coeffs, atol=1e-6)
    with open(path) as f:
        header = f.readline().strip().split(",")
    assert header == BLENDSHAPE_CLASSES


def test_discovery_and_repeat_regex(toy_blendvoca, tmp_path):
    audio_dir, coeffs_dir = toy_blendvoca
    paths = get_data_paths(
        audio_dir, coeffs_dir, ["FaceTalk_170725_00137_TA"]
    )
    assert len(paths) == 3
    # add a repeated generation file: sentence01-5.csv should be found too
    extra = os.path.join(coeffs_dir, "FaceTalk_170725_00137_TA", "sentence01-5.csv")
    save_blendshape_coeffs(np.zeros((10, 32)), BLENDSHAPE_CLASSES, extra)
    paths2 = get_data_paths(audio_dir, coeffs_dir, ["FaceTalk_170725_00137_TA"])
    assert len(paths2) == 4
    os.remove(extra)


def test_train_collate_windowing(toy_blendvoca):
    audio_dir, coeffs_dir = toy_blendvoca
    ds = BlendVOCATrainDataset(
        audio_dir=audio_dir,
        blendshape_coeffs_dir=coeffs_dir,
        sampling_rate=16000,
        window_size_min=120,
        seed=0,
    )
    assert len(ds) == 6  # 2 train subjects × 3 sentences
    items = [ds[i] for i in range(4)]
    batch = ds.collate_fn(items)
    ws = batch.blendshape_coeffs.shape[1]
    assert ws >= 120
    assert batch.blendshape_coeffs.shape == (4, ws, 32)
    wave_len = (16000 * ws) // 60
    for w in batch.waveform:
        assert w.shape[0] == wave_len
    assert batch.cond.shape == (4,)


def test_hflip_swaps_mirror_columns(toy_blendvoca):
    audio_dir, coeffs_dir = toy_blendvoca
    ds = BlendVOCATrainDataset(
        audio_dir=audio_dir,
        blendshape_coeffs_dir=coeffs_dir,
        sampling_rate=16000,
        uncond_prob=0.0,
        seed=0,
    )
    raw = ds.data_preload[0][1]
    # run many draws; at least one flipped and one unflipped
    flipped = unflipped = False
    il = BLENDSHAPE_CLASSES.index("jawLeft")
    ir = BLENDSHAPE_CLASSES.index("jawRight")
    for _ in range(40):
        item = ds[0]
        if np.allclose(item.blendshape_coeffs[:, il], raw[:, ir]):
            flipped = True
        if np.allclose(item.blendshape_coeffs[:, il], raw[:, il]):
            unflipped = True
    assert flipped and unflipped


def test_val_dataset_full_length(toy_blendvoca):
    audio_dir, coeffs_dir = toy_blendvoca
    ds = BlendVOCAValDataset(
        audio_dir=audio_dir, blendshape_coeffs_dir=coeffs_dir, sampling_rate=16000
    )
    assert len(ds) == 3  # 1 val subject × 3 sentences
    item = ds[0]
    n = item.blendshape_coeffs.shape[0]
    assert item.waveform.shape[0] == (16000 * n) // 60


def test_vae_dataset_fixed_window(toy_blendvoca):
    _, coeffs_dir = toy_blendvoca
    ds = BlendVOCAVAEDataset(blendshape_coeffs_dir=coeffs_dir, dataset_type="train")
    assert len(ds) == 6
    item = ds[0]
    assert item.blendshape_coeffs.shape == (120, 32)
    batch = BlendVOCAVAEDataset.collate_fn([ds[0], ds[1]])
    assert batch.blendshape_coeffs.shape == (2, 120, 32)


def test_prefetch_matches_direct_iteration_and_propagates_errors():
    """prefetch() must yield exactly the loader's sequence (order and
    identity), exhaust cleanly, and re-raise producer exceptions at the
    consumer."""
    from said_tpu.data.loader import prefetch

    items = [{"i": i} for i in range(7)]
    assert list(prefetch(iter(items), depth=2)) == items
    assert list(prefetch(iter([]), depth=2)) == []

    def boom():
        yield 1
        yield 2
        raise ValueError("producer failed")

    got = []
    import pytest as _pytest

    with _pytest.raises(ValueError, match="producer failed"):
        for x in prefetch(boom(), depth=1):
            got.append(x)
    assert got == [1, 2]


def test_prefetch_abandonment_releases_the_producer_thread():
    """Abandoning the generator early (break / exception in the loop
    body) must stop the producer thread and release its source — not
    leave it parked forever on the bounded queue (depth batches pinned
    per abandoned epoch in a long-lived process)."""
    import gc
    import threading
    import time

    from said_tpu.data.loader import prefetch

    released = threading.Event()

    def source():
        try:
            for i in range(10_000):
                yield {"i": i}
        finally:
            released.set()

    gen = prefetch(source(), depth=2)
    assert next(gen)["i"] == 0
    gen.close()  # what a for-loop break / loop-body exception triggers
    gc.collect()
    assert released.wait(timeout=5.0), "producer thread still parked"

    # same through the natural consumer shape: a break inside a for-loop
    released.clear()
    for item in prefetch(source(), depth=2):
        break
    gc.collect()  # the abandoned generator's close() runs at collection
    deadline = time.time() + 5.0
    while not released.is_set() and time.time() < deadline:
        gc.collect()
        time.sleep(0.05)
    assert released.is_set(), "producer thread still parked after break"
