"""Tests for the dependency-free TensorBoard event writer
(utils/tensorboard.py): wire-format round trip and trainer integration."""

import glob
import os
import struct

import numpy as np

from pointcloud_style_transfer_tpu.utils.tensorboard import (SummaryWriter,
                                                             _masked_crc)


def _read_records(path):
    """Parse a TFRecord event file, verifying both CRCs per record."""
    records = []
    with open(path, "rb") as f:
        data = f.read()
    off = 0
    while off < len(data):
        header = data[off:off + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", data[off + 8:off + 12])
        assert hcrc == _masked_crc(header), "header crc mismatch"
        payload = data[off + 12:off + 12 + length]
        (pcrc,) = struct.unpack("<I",
                                data[off + 12 + length:off + 16 + length])
        assert pcrc == _masked_crc(payload), "payload crc mismatch"
        records.append(payload)
        off += 16 + length
    return records


def _parse_fields(buf):
    """Minimal protobuf wire decoder -> {field: [values]}."""
    fields = {}
    off = 0
    while off < len(buf):
        key = 0
        shift = 0
        while True:
            b = buf[off]
            off += 1
            key |= (b & 0x7F) << shift
            shift += 7
            if not b & 0x80:
                break
        field, wt = key >> 3, key & 7
        if wt == 0:  # varint
            v = 0
            shift = 0
            while True:
                b = buf[off]
                off += 1
                v |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
        elif wt == 1:  # fixed64
            (v,) = struct.unpack("<d", buf[off:off + 8])
            off += 8
        elif wt == 5:  # fixed32
            (v,) = struct.unpack("<f", buf[off:off + 4])
            off += 4
        elif wt == 2:  # length-delimited
            ln = 0
            shift = 0
            while True:
                b = buf[off]
                off += 1
                ln |= (b & 0x7F) << shift
                shift += 7
                if not b & 0x80:
                    break
            v = buf[off:off + ln]
            off += ln
        else:
            raise AssertionError(f"unexpected wire type {wt}")
        fields.setdefault(field, []).append(v)
    return fields


def test_scalar_round_trip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("Loss/Train", 0.5, 1)
    w.add_scalar("Loss/Train", 0.25, 2)
    w.add_scalar("Loss/Validation", 0.75, 2)
    w.close()

    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    records = _read_records(files[0])
    assert len(records) == 4  # version header + 3 scalars

    # header record: file_version (field 3) == brain.Event:2
    head = _parse_fields(records[0])
    assert head[3] == [b"brain.Event:2"]

    got = []
    for rec in records[1:]:
        ev = _parse_fields(rec)
        step = ev.get(2, [0])[0]
        summary = _parse_fields(ev[5][0])
        value = _parse_fields(summary[1][0])
        tag = value[1][0].decode()
        got.append((tag, step, value[2][0]))
    assert got[0][0] == "Loss/Train" and got[0][1] == 1
    np.testing.assert_allclose(got[0][2], 0.5)
    assert got[1] == ("Loss/Train", 2, 0.25)
    assert got[2][0] == "Loss/Validation"
    np.testing.assert_allclose(got[2][2], 0.75)


def test_crc32c_known_vectors():
    """crc32c against published test vectors (RFC 3720 appendix B.4)."""
    from pointcloud_style_transfer_tpu.utils.tensorboard import _crc32c
    assert _crc32c(b"") == 0
    assert _crc32c(b"a") == 0xC1D04330
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(bytes(32)) == 0x8A9136AA


def test_trainer_writes_event_files(tmp_path):
    """End-to-end: a tiny training run produces a readable event file with
    the reference's Loss/Train and Loss/Validation tags — in an environment
    that never imports torch (reference behavior: training/trainer.py:52)."""
    from pointcloud_style_transfer_tpu.config import Config
    from pointcloud_style_transfer_tpu.data import (PointCloudPreprocessor,
                                                    create_dataloaders)
    from pointcloud_style_transfer_tpu.training import DiffusionTrainer

    rng = np.random.default_rng(0)
    pre = PointCloudPreprocessor(total_points=128, global_points=32, seed=0)
    data_dir = tmp_path / "processed"
    for split, n in (("train", 2), ("val", 2)):
        for i in range(n):
            sim = rng.uniform(-3, 3, (128, 3)).astype(np.float32)
            real = rng.uniform(-3, 3, (128, 3)).astype(np.float32)
            pre.save_hierarchical_data(sim, real, str(data_dir / split),
                                       f"{split}_{i:04d}")
    cfg = Config(total_points=128, global_points=32, num_epochs=2,
                 batch_size=1, num_timesteps=10, val_interval=1,
                 feature_dim=32, time_embed_dim=16, use_amp=False,
                 warmup_epochs=1,
                 processed_data_dir=str(data_dir),
                 checkpoint_dir=str(tmp_path / "ckpt"),
                 log_dir=str(tmp_path / "logs"),
                 result_dir=str(tmp_path / "out"),
                 experiment_name="tb_test")
    train_loader, val_loader = create_dataloaders(cfg)
    trainer = DiffusionTrainer(cfg, resume=False)
    trainer.train(train_loader, val_loader)

    files = glob.glob(os.path.join(cfg.log_dir, "tb_test",
                                   "events.out.tfevents.*"))
    assert files, "no event file written"
    tags = set()
    for rec in _read_records(files[0])[1:]:
        ev = _parse_fields(rec)
        if 5 in ev:
            summary = _parse_fields(ev[5][0])
            value = _parse_fields(summary[1][0])
            tags.add(value[1][0].decode())
    assert "Loss/Train" in tags
    assert "Loss/Validation" in tags
