import os
import struct

import numpy as np
import pytest

from tpurec.data import crc32c
from tpurec.data.example_proto import (
    decode_example,
    decode_sequence_example,
    encode_example,
    encode_sequence_example,
)
from tpurec.data.recordio import (
    ShardedTFRecordWriter,
    TFRecordWriter,
    frame_record,
    iter_framed,
    read_tfrecords,
)


class TestCrc32c:
    def test_known_vectors(self):
        # RFC 3720 test vectors
        assert crc32c.crc32c(b"") == 0x0
        assert crc32c.crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c.crc32c(b"\xff" * 32) == 0x62A8AB43
        assert crc32c.crc32c(bytes(range(32))) == 0x46DD794E
        assert crc32c.crc32c(b"123456789") == 0xE3069283

    def test_batch_matches_scalar(self):
        msgs = [b"hello", b"", b"x" * 100, bytes(range(256))]
        assert crc32c.crc32c_batch(msgs) == [crc32c.crc32c(m) for m in msgs]

    def test_mask_unmask(self):
        c = crc32c.crc32c(b"data")
        assert crc32c.unmask(crc32c.mask(c)) == c


class TestExampleProto:
    def test_roundtrip_mixed(self):
        feats = {
            "ids": np.array([3, 1, 4, 1, 5], dtype=np.int64),
            "label": [1],
            "price": np.array([1.5, -2.25], dtype=np.float32),
            "name": [b"alpha", b"beta"],
            "neg": [-7],
        }
        decoded = decode_example(encode_example(feats))
        np.testing.assert_array_equal(decoded["ids"], feats["ids"])
        np.testing.assert_array_equal(decoded["label"], [1])
        np.testing.assert_allclose(decoded["price"], feats["price"])
        assert list(decoded["name"]) == [b"alpha", b"beta"]
        np.testing.assert_array_equal(decoded["neg"], [-7])

    def test_roundtrip_sequence(self):
        ctx = {"user_id": [42], "label": [1.0]}
        seqs = {"clicks": [[1, 2], [3, 4], [5, 6]]}
        c, s = decode_sequence_example(encode_sequence_example(ctx, seqs))
        np.testing.assert_array_equal(c["user_id"], [42])
        assert len(s["clicks"]) == 3
        np.testing.assert_array_equal(s["clicks"][1], [3, 4])

    @pytest.mark.skipif(
        not os.environ.get("TPUREC_TF_COMPAT"), reason="TF cross-check is opt-in (slow import)"
    )
    def test_tf_compat(self, tmp_path):
        import tensorflow as tf

        feats = {"ids": np.array([1, 2, 3], dtype=np.int64), "v": np.array([0.5], np.float32)}
        ours = encode_example(feats)
        theirs = tf.train.Example(
            features=tf.train.Features(
                feature={
                    "ids": tf.train.Feature(int64_list=tf.train.Int64List(value=[1, 2, 3])),
                    "v": tf.train.Feature(float_list=tf.train.FloatList(value=[0.5])),
                }
            )
        ).SerializeToString()
        # decode each other's bytes
        got = decode_example(theirs)
        np.testing.assert_array_equal(got["ids"], [1, 2, 3])
        parsed = tf.train.Example.FromString(ours)
        assert list(parsed.features.feature["ids"].int64_list.value) == [1, 2, 3]
        # full file framing check
        path = str(tmp_path / "x.tfrecord")
        with TFRecordWriter(path) as w:
            w.write(ours)
        ds = tf.data.TFRecordDataset(path)
        assert [r.numpy() for r in ds] == [ours]


class TestRecordIO:
    def test_frame_roundtrip(self, tmp_path):
        path = str(tmp_path / "a.tfrecord")
        records = [b"one", b"two" * 100, b""]
        with TFRecordWriter(path, flush_every=2) as w:
            for r in records:
                w.write(r)
        assert list(iter_framed(path, verify=True)) == records

    def test_corruption_detected(self, tmp_path):
        path = str(tmp_path / "a.tfrecord")
        with TFRecordWriter(path) as w:
            w.write(b"payload-data")
        raw = bytearray(open(path, "rb").read())
        raw[14] ^= 0xFF  # flip a payload byte
        open(path, "wb").write(bytes(raw))
        with pytest.raises(IOError):
            list(iter_framed(path, verify=True))

    def test_sharded_writer_rotation(self, tmp_path):
        out = str(tmp_path)
        with ShardedTFRecordWriter(out, records_per_file=3) as w:
            for i in range(7):
                w.write(f"t{i}".encode(), "train")
            w.write(b"e0", "test")
        train_paths = sorted(
            os.path.join(out, p) for p in os.listdir(out) if p.startswith("train")
        )
        assert len(train_paths) == 3  # 3 + 3 + 1
        counts = [len(list(iter_framed(p))) for p in train_paths]
        assert counts == [3, 3, 1]
        all_records = list(read_tfrecords(train_paths))
        assert all_records == [f"t{i}".encode() for i in range(7)]

    def test_native_crc_if_built(self):
        lib = crc32c._load_native()
        if lib is None:
            pytest.skip("native librecordio.so not built")
        assert lib.crc32c(b"123456789", 9) == 0xE3069283
