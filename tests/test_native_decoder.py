"""Native C++ columnar Example decoder: parity with the python codec."""

import numpy as np
import pytest

from tpurec.data import native
from tpurec.data.example_proto import decode_example, encode_example
from tpurec.data.loader import decode_columnar
from tpurec.data.recordio import TFRecordWriter, read_tfrecords

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="librecordio.so not built (make -C cpp)"
)


@pytest.fixture()
def shard(tmp_path):
    path = str(tmp_path / "x.tfrecord")
    rng = np.random.default_rng(0)
    with TFRecordWriter(path) as w:
        for i in range(500):
            w.write(
                encode_example(
                    {
                        "uid": [int(rng.integers(0, 1000))],
                        "seq": rng.integers(0, 100, 8).astype(np.int64),
                        "label": np.asarray([float(i % 2)], np.float32),
                        "floats": rng.random(3).astype(np.float32),
                    }
                )
            )
    return path


def test_native_matches_python(shard):
    schema = native.infer_schema(decode_example(next(read_tfrecords([shard]))))
    cols = native.decode_columnar_native(shard, schema, verify=True)
    assert cols["uid"].shape == (500,)
    assert cols["seq"].shape == (500, 8)
    assert cols["floats"].shape == (500, 3)
    # python loader (which itself prefers native; force python by decoding raw)
    py = {}
    for raw in read_tfrecords([shard]):
        for k, v in decode_example(raw).items():
            py.setdefault(k, []).append(v)
    np.testing.assert_array_equal(cols["uid"], np.concatenate(py["uid"]))
    np.testing.assert_array_equal(cols["seq"], np.stack(py["seq"]))
    np.testing.assert_allclose(cols["floats"], np.stack(py["floats"]))


def test_loader_uses_native_path(shard):
    cols = decode_columnar([shard])
    assert cols["uid"].shape == (500,)
    assert cols["seq"].shape == (500, 8)


def test_missing_feature_detected(shard, tmp_path):
    schema = {"nope": (native.KIND_INT64, 1)}
    with pytest.raises(IOError):
        native.decode_columnar_native(shard, schema)


def test_corruption_detected(shard):
    raw = bytearray(open(shard, "rb").read())
    raw[20] ^= 0xFF
    open(shard, "wb").write(bytes(raw))
    schema = {"uid": (native.KIND_INT64, 1)}
    with pytest.raises(IOError):
        native.decode_columnar_native(shard, schema, verify=True)
