"""Native framestore: build, async writes, mmap reads, integration."""
import os
import time

import numpy as np
import pytest

from srl_tpu.native.framestore import available


@pytest.mark.fast
def test_native_build_and_roundtrip(tmp_path):
    if not available():
        pytest.skip("no g++ toolchain")
    from srl_tpu.native import FrameStoreReader, FrameStoreWriter

    path = str(tmp_path / "frames.srlf")
    frames = np.random.RandomState(0).randint(
        0, 255, size=(37, 16, 24, 3), dtype=np.uint8
    )
    with FrameStoreWriter(path, (16, 24, 3)) as w:
        # Multiple async pushes.
        w.push(frames[:10])
        w.push(frames[10:25])
        w.push(frames[25:])
    with FrameStoreReader(path) as r:
        assert r.frames.shape == (37, 16, 24, 3)
        np.testing.assert_array_equal(np.array(r.frames), frames)


@pytest.mark.fast
def test_native_float32_store(tmp_path):
    if not available():
        pytest.skip("no g++ toolchain")
    from srl_tpu.native import FrameStoreReader, FrameStoreWriter

    path = str(tmp_path / "vec.srlf")
    data = np.random.RandomState(1).randn(100, 7).astype(np.float32)
    with FrameStoreWriter(path, (7,), np.float32) as w:
        w.push(data)
    with FrameStoreReader(path) as r:
        np.testing.assert_array_equal(np.array(r.frames), data)


@pytest.mark.fast
def test_async_writer_does_not_block(tmp_path):
    if not available():
        pytest.skip("no g++ toolchain")
    from srl_tpu.native import FrameStoreWriter

    path = str(tmp_path / "big.srlf")
    batch = np.zeros((64, 224, 224, 3), np.uint8)  # ~9.6 MB per push
    w = FrameStoreWriter(path, (224, 224, 3))
    t0 = time.perf_counter()
    for _ in range(8):
        w.push(batch)
    enqueue_time = time.perf_counter() - t0
    total = w.close()
    assert total == 8 * 64
    # Enqueueing ~77MB must be far faster than synchronous compressed IO.
    assert enqueue_time < 2.0, f"enqueue took {enqueue_time:.2f}s"
    assert os.path.getsize(path) == 64 + 8 * 64 * 224 * 224 * 3


@pytest.mark.fast
def test_episode_saver_uses_framestore(tmp_path):
    from srl_tpu.srl.episode_saver import EpisodeSaver, load_dataset

    saver = EpisodeSaver("fs_test", path=str(tmp_path))
    obs = np.zeros((8, 8, 3), np.uint8)
    saver.reset(obs, np.zeros(2), np.zeros(2))
    for i in range(3):
        saver.step(obs + i, 1, 0.5, False, np.zeros(2))
    folder = saver.save()
    if available():
        assert os.path.exists(os.path.join(folder, "frames.srlf"))
    data = load_dataset(folder)
    assert data["observations"].shape == (4, 8, 8, 3)
    assert data["observations"][2].max() == 1
