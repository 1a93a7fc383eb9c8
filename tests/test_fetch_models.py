"""scripts/fetch_models.py: offline fetch + checksum + npz conversion.

No network: the "server" is a fake opener serving synthetic caffemodel bytes,
and offline mode copies from a local directory (reference download step:
CMakeLists.txt:985-994).
"""

import contextlib
import hashlib
import io
import sys

import numpy as np
import pytest

import jax

REPO = __import__("pathlib").Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))

import fetch_models  # noqa: E402

from openpose_tpu.models import caffe_proto, checkpoint, graph  # noqa: E402


def synthetic_caffemodel(spec_name="mpi_15", seed=0):
    """Serialize random-init params of a real spec as caffemodel bytes."""
    spec = graph.load_spec(spec_name)
    params = graph.init_params(spec, jax.random.PRNGKey(seed))
    blobs = {}
    for layer in spec.layers:
        p = params.get(layer.name)
        if p is None:
            continue
        if "w" in p:   # HWIO -> caffe OIHW
            blobs[layer.name] = [
                np.asarray(p["w"]).transpose(3, 2, 0, 1),
                np.asarray(p["b"])]
        elif "slope" in p:
            blobs[layer.name] = [np.asarray(p["slope"])]
    return caffe_proto.serialize_caffemodel(blobs), params


@pytest.fixture(scope="module")
def mpi_blob():
    data, params = synthetic_caffemodel()
    return data, hashlib.md5(data).hexdigest(), params


def patched_models(monkeypatch, md5):
    rel, _md5, spec = fetch_models.MODELS["mpi_15"]
    monkeypatch.setitem(fetch_models.MODELS, "mpi_15", (rel, md5, spec))
    return rel


class TestFetchModels:
    def test_offline_from_dir_and_convert(self, tmp_path, monkeypatch,
                                          mpi_blob):
        data, md5, params = mpi_blob
        rel = patched_models(monkeypatch, md5)
        src = tmp_path / "offline" / rel
        src.parent.mkdir(parents=True)
        src.write_bytes(data)
        dest = tmp_path / "models"
        out = fetch_models.fetch_one("mpi_15", dest, "http://unused",
                                     from_dir=tmp_path / "offline")
        assert out == dest / rel and out.exists()
        npz = fetch_models.convert_one("mpi_15", out)
        loaded = checkpoint.load(str(npz))
        np.testing.assert_allclose(
            np.asarray(loaded["conv1_1"]["w"]),
            np.asarray(params["conv1_1"]["w"]), rtol=1e-6)

    def test_converted_npz_is_forward_equivalent(self, tmp_path,
                                                 monkeypatch, mpi_blob):
        """The full caffemodel -> npz -> pytree round trip: EVERY leaf
        equals the source params and graph.forward on the converted tree
        reproduces the source net's output bit-for-bit (keeps the
        one-command real-weight path scripts/fetch_models.py +
        scripts/coco_val.py from rotting while the download itself stays
        externally blocked)."""
        data, md5, params = mpi_blob
        rel = patched_models(monkeypatch, md5)
        src = tmp_path / "offline" / rel
        src.parent.mkdir(parents=True)
        src.write_bytes(data)
        out = fetch_models.fetch_one("mpi_15", tmp_path / "m",
                                     "http://unused",
                                     from_dir=tmp_path / "offline")
        loaded = checkpoint.load(str(fetch_models.convert_one("mpi_15",
                                                              out)))
        assert set(loaded) == set(params)
        for layer, leaves in params.items():
            assert set(loaded[layer]) == set(leaves), layer
            for k, v in leaves.items():
                np.testing.assert_array_equal(
                    np.asarray(loaded[layer][k]), np.asarray(v),
                    err_msg=f"{layer}/{k}")
        jax.config.update("jax_platforms", "cpu")
        spec = graph.load_spec("mpi_15")
        x = np.random.RandomState(0).uniform(
            -0.5, 0.5, (1, 32, 32, 3)).astype(np.float32)
        import jax.numpy as jnp
        want = graph.forward(params, spec, jnp.asarray(x), jnp.float32)
        got = graph.forward(loaded, spec, jnp.asarray(x), jnp.float32)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))

    def test_fake_server_download(self, tmp_path, monkeypatch, mpi_blob):
        data, md5, _params = mpi_blob
        rel = patched_models(monkeypatch, md5)
        urls = []

        @contextlib.contextmanager
        def opener(url):
            urls.append(url)
            yield io.BytesIO(data)

        out = fetch_models.fetch_one("mpi_15", tmp_path, "http://srv/models/",
                                     opener=opener)
        assert out.exists() and urls == ["http://srv/models/" + rel]
        # second call: cached, checksum OK, no new request
        fetch_models.fetch_one("mpi_15", tmp_path, "http://srv/models/",
                               opener=opener)
        assert len(urls) == 1

    def test_checksum_mismatch_rejected(self, tmp_path, monkeypatch,
                                        mpi_blob):
        data, _md5, _params = mpi_blob
        patched_models(monkeypatch, "0" * 32)

        @contextlib.contextmanager
        def opener(url):
            yield io.BytesIO(data)

        with pytest.raises(ValueError, match="MD5"):
            fetch_models.fetch_one("mpi_15", tmp_path, "http://srv/",
                                   opener=opener)
        rel = fetch_models.MODELS["mpi_15"][0]
        assert not (tmp_path / rel).exists()   # bad file removed

    def test_offline_missing_file_lists_name(self, tmp_path, monkeypatch,
                                             mpi_blob):
        _data, md5, _params = mpi_blob
        patched_models(monkeypatch, md5)
        with pytest.raises(FileNotFoundError, match="mpi_15"):
            fetch_models.fetch_one("mpi_15", tmp_path / "d", "http://unused",
                                   from_dir=tmp_path / "empty")

    def test_main_offline_end_to_end(self, tmp_path, monkeypatch, mpi_blob):
        data, md5, _params = mpi_blob
        rel = patched_models(monkeypatch, md5)
        src = tmp_path / "offline" / rel
        src.parent.mkdir(parents=True)
        src.write_bytes(data)
        rc = fetch_models.main(["--dest", str(tmp_path / "m"),
                                "--only", "mpi_15",
                                "--from-dir", str(tmp_path / "offline")])
        assert rc == 0
        assert (tmp_path / "m" / rel).with_suffix(".npz").exists()
