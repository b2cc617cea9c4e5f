"""GNS converter tests: round-trip through a synthesized tfrecord."""

import json
import os
import struct
import tempfile

import numpy as np

from dmcf_tpu.data.dataset import read_msgpack_zst
from dmcf_tpu.data.gns_converter import (convert, estimate_normals,
                                         parse_gns_trajectory,
                                         parse_sequence_example,
                                         sample_boundary_walls)


# -- tiny protobuf encoder (test-side oracle) -------------------------------

def _varint(x):
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        out += bytes([b | (0x80 if x else 0)])
        if not x:
            return out


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _ld(num, data):
    return _field(num, 2, _varint(len(data)) + data)


def _bytes_feature(values):
    inner = b"".join(_ld(1, v) for v in values)
    return _ld(1, inner)  # Feature.bytes_list


def _int64_feature(values):
    packed = b"".join(_varint(v) for v in values)
    return _ld(3, _ld(1, packed))  # Feature.int64_list (packed)


def _map_entry(key, feature_bytes):
    return _ld(1, _ld(1, key.encode()) + _ld(2, feature_bytes))


def make_sequence_example(positions, ptype):
    """positions: [T, N, dim] float32; ptype: [N] int64."""
    context = _map_entry("particle_type", _int64_feature(list(ptype)))
    # FeatureList of per-step Feature(bytes_list) under key 'position'
    feats = b"".join(_ld(1, _bytes_feature([p.astype("<f4").tobytes()]))
                     for p in positions)
    flist_entry = _ld(1, _ld(1, b"position") + _ld(2, feats))
    return _ld(1, context) + _ld(2, flist_entry)


def write_tfrecord(path, records):
    with open(path, "wb") as f:
        for rec in records:
            f.write(struct.pack("<Q", len(rec)))
            f.write(b"\x00" * 4)  # length crc (ignored by reader)
            f.write(rec)
            f.write(b"\x00" * 4)  # data crc


class TestProtoParsing:
    def test_roundtrip(self):
        T, N, dim = 4, 6, 2
        rng = np.random.RandomState(0)
        pos = rng.rand(T, N, dim).astype(np.float32)
        ptype = np.array([5, 5, 5, 5, 3, 3], np.int64)
        rec = make_sequence_example(pos, ptype)
        ctx, lists = parse_sequence_example(rec)
        assert ctx["particle_type"][0] == "int64"
        got = parse_gns_trajectory(rec, {"dim": dim,
                                         "sequence_length": T - 1})
        np.testing.assert_allclose(got["pos"], pos, atol=0)
        np.testing.assert_array_equal(got["type"], ptype)


class TestModuleEncoder:
    def test_encoder_roundtrips_through_parser(self):
        """The module's writer (used by scripts/gns_headroom.py to
        synthesize WaterRamps-scale data) must produce bytes the module's
        own parser decodes identically to the test-side oracle."""
        from dmcf_tpu.data.gns_converter import encode_sequence_example
        T, N, dim = 5, 7, 2
        rng = np.random.RandomState(3)
        pos = rng.rand(T, N, dim).astype(np.float32)
        ptype = np.array([5] * 5 + [3] * 2, np.int64)
        rec = encode_sequence_example(pos, ptype)
        got = parse_gns_trajectory(rec, {"dim": dim,
                                         "sequence_length": T - 1})
        np.testing.assert_allclose(got["pos"], pos, atol=0)
        np.testing.assert_array_equal(got["type"], ptype)

    def test_encoder_step_context(self):
        from dmcf_tpu.data.gns_converter import encode_sequence_example
        pos = np.zeros((3, 2, 2), np.float32)
        ctx = np.arange(6, dtype=np.float32).reshape(3, 2)
        rec = encode_sequence_example(pos, np.array([5, 5]),
                                      step_context=ctx)
        got = parse_gns_trajectory(rec, {"dim": 2, "sequence_length": 2})
        np.testing.assert_allclose(got["ctx"], ctx, atol=0)


class TestConvert:
    def test_end_to_end(self):
        T, N, dim = 101, 8, 2
        rng = np.random.RandomState(1)
        pos = rng.rand(T, N, dim).astype(np.float32)
        ptype = np.array([5] * 6 + [3] * 2, np.int64)
        with tempfile.TemporaryDirectory() as tmp:
            write_tfrecord(os.path.join(tmp, "train.tfrecord"),
                           [make_sequence_example(pos, ptype)])
            with open(os.path.join(tmp, "metadata.json"), "w") as f:
                json.dump({"dim": dim, "sequence_length": T - 1}, f)
            n = convert(tmp, tmp, split="train", block_size=50, res=16)
            assert n == 2  # 101 frames -> two 50-frame blocks
            scene = read_msgpack_zst(os.path.join(
                tmp, "train", "sim_0000_00.msgpack.zst"))
            assert len(scene) == 50
            f0 = scene[0]
            assert f0["pos"].shape == (6, 3)
            assert np.all(f0["pos"][:, 2] == 0)
            assert f0["box"].shape[0] > 2  # real bnds + sampled walls
            assert f0["box"].shape == f0["box_normals"].shape
            # velocity is the forward difference / dt
            np.testing.assert_allclose(
                f0["vel"],
                (scene[1]["pos"] - f0["pos"]) / 0.0025, atol=1e-3)


class TestBoundaryHelpers:
    def test_wall_normals_point_inward(self):
        pts, nor = sample_boundary_walls(2, [16, 16, 1])
        left = pts[:, 0] < 2
        assert np.all(nor[left] == [1, 0, 0])
        assert np.allclose(np.linalg.norm(nor, axis=-1), 1.0)

    def test_estimate_normals_line_endpoints(self):
        """Interior points of a straight line have symmetric neighborhoods
        (normal ~ 0, matching the reference splat); endpoints point outward
        along the line."""
        xs = np.linspace(0.1, 0.9, 20)
        bnds = np.stack([xs, np.full_like(xs, 0.2),
                         np.zeros_like(xs)], -1)
        nor = estimate_normals(bnds, res=16)
        assert nor[0, 0] < -0.9   # left endpoint: -x
        assert nor[-1, 0] > 0.9   # right endpoint: +x
        assert np.linalg.norm(nor[10]) < 0.5  # interior ~ cancels
