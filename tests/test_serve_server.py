"""Online serving (serve/server.py): bucketed padding, request
coalescing, HTTP front end, and the serve CLI. New production-serving
capability — the reference's deployment surface is unpickle-the-module
(tone_bias_model.py:305-338)."""

import json
import os
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import jax

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.serve.server import (
    DynamicBatcher,
    InferenceSession,
    _buckets,
    make_http_server,
)
from skin_image_analysis_tpu.train import checkpoint as ckpt_lib
from skin_image_analysis_tpu.train.state import create_train_state

SIZE = 16


@pytest.fixture(scope="module")
def exp_folder(tmp_path_factory):
    folder = tmp_path_factory.mktemp("serve_exp")
    cfg = ModelConfig(
        conv_features=(4, 8), linear_features=(8,), dropout=(0.0,),
        image_size=SIZE, compute_dtype="float32",
    )
    state, _ = create_train_state(
        cfg, OptimConfig(learning_rate=1e-3), jax.random.key(0),
        batch_size=2,
    )
    ckpt_lib.save_model(
        str(folder / ckpt_lib.MODEL_FILENAME), cfg, state.params,
        state.batch_stats,
    )
    return str(folder)


@pytest.fixture(scope="module")
def session(exp_folder):
    return InferenceSession.from_experiment(exp_folder, max_batch=8)


def test_bucket_ladder():
    assert _buckets(8) == [1, 2, 4, 8]
    assert _buckets(1) == [1]
    # non-power-of-two caps append the cap itself
    assert _buckets(6) == [1, 2, 4, 6]


def test_session_pads_to_buckets_and_slices_back(session):
    rng = np.random.default_rng(0)
    pixels = rng.integers(0, 255, (3, SIZE, SIZE, 3), np.uint8)
    out = session.predict(pixels)
    assert out["pred"].shape == (3,)
    assert out["log_probs"].shape == (3, 2)
    # padded rows must not change the real rows: a batch of 3 rides the
    # 4-bucket; compare against the same rows in a full 4-batch
    full = session.predict(
        np.concatenate([pixels, pixels[:1]])
    )
    np.testing.assert_allclose(
        out["log_probs"], full["log_probs"][:3], atol=1e-6
    )
    # only bucket shapes ever compiled
    assert session.compiled <= set(session.buckets)


def test_session_single_image_and_oversize_batch(session):
    rng = np.random.default_rng(1)
    one = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)
    out = session.predict(one)  # 3-D input auto-batches
    assert out["pred"].shape == (1,)

    # 11 rows > max_batch 8: chunked, order preserved
    pixels = rng.integers(0, 255, (11, SIZE, SIZE, 3), np.uint8)
    out = session.predict(pixels)
    assert out["pred"].shape == (11,)
    ref = np.concatenate([
        session.predict(pixels[i:i + 1])["pred"] for i in range(11)
    ])
    np.testing.assert_array_equal(out["pred"], ref)

    with pytest.raises(ValueError, match="empty"):
        session.predict(np.zeros((0, SIZE, SIZE, 3), np.uint8))


def test_batcher_coalesces_queued_requests(session):
    """Requests enqueued before a drain ride ONE device batch."""
    batcher = DynamicBatcher(session, window_ms=1.0)
    rng = np.random.default_rng(2)
    images = rng.integers(0, 255, (5, SIZE, SIZE, 3), np.uint8)
    futures = [batcher.submit(img) for img in images]
    drained = batcher.drain_once(wait=False)
    assert drained == 5
    snap = batcher.stats.snapshot()
    assert snap == {"requests": 5, "batches": 1, "rows": 5,
                    "max_coalesced": 5}
    ref = session.predict(images)
    for i, fut in enumerate(futures):
        res = fut.result(timeout=5)
        assert int(res["pred"]) == int(ref["pred"][i])
        np.testing.assert_allclose(
            res["log_probs"], ref["log_probs"][i], atol=1e-6
        )


def test_batcher_worker_thread_and_errors(session):
    batcher = DynamicBatcher(session, window_ms=1.0).start()
    try:
        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)
        res = batcher.submit(img).result(timeout=30)
        assert set(res) == {"log_probs", "pred", "p_malignant"}

        with pytest.raises(ValueError, match="one .* image"):
            batcher.submit(np.zeros((2, SIZE, SIZE, 3), np.uint8))

        # a wrong-SIZED single image is rejected at the door too: one
        # off-shape row in a coalesced batch would fail np.stack for the
        # whole batch and (pre-fix) kill the worker thread permanently
        with pytest.raises(ValueError, match="got"):
            batcher.submit(np.zeros((SIZE + 2, SIZE + 2, 3), np.uint8))
        with pytest.raises(ValueError, match="got"):
            batcher.submit(np.zeros((SIZE, SIZE, 2), np.uint8))

        # and the worker is still alive afterwards
        img2 = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)
        assert int(batcher.submit(img2).result(timeout=30)["pred"]) in (0, 1)
    finally:
        batcher.stop()


def test_batcher_delivers_exceptions_not_crashes(exp_folder):
    """A failing session resolves futures with the exception and keeps
    the worker alive for the next batch."""
    sess = InferenceSession.from_experiment(exp_folder, max_batch=4)
    boom = {"on": True}
    real_predict = sess.predict

    def flaky(pixels):
        if boom["on"]:
            raise RuntimeError("injected")
        return real_predict(pixels)

    sess.predict = flaky
    batcher = DynamicBatcher(sess, window_ms=1.0)
    fut = batcher.submit(np.zeros((SIZE, SIZE, 3), np.uint8))
    batcher.drain_once(wait=False)
    with pytest.raises(RuntimeError, match="injected"):
        fut.result(timeout=5)
    boom["on"] = False
    fut2 = batcher.submit(np.zeros((SIZE, SIZE, 3), np.uint8))
    batcher.drain_once(wait=False)
    assert int(fut2.result(timeout=5)["pred"]) in (0, 1)


@pytest.fixture()
def http_server(session):
    batcher = DynamicBatcher(session, window_ms=1.0).start()
    server = make_http_server(batcher, host="127.0.0.1", port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", session
    server.shutdown()
    server.server_close()
    batcher.stop()


def _post(url, data, ctype):
    req = urllib.request.Request(
        url, data=data, headers={"Content-Type": ctype}, method="POST"
    )
    with urllib.request.urlopen(req, timeout=30) as resp:
        return json.loads(resp.read())


def test_http_predict_raw_and_encoded(http_server):
    base, session = http_server
    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)

    # raw uint8 body
    got = _post(f"{base}/predict", img.tobytes(),
                "application/octet-stream")
    assert got["class"] in ("benign", "malignant")
    ref = session.predict(img)
    assert got["pred"] == int(ref["pred"][0])
    np.testing.assert_allclose(
        got["p_malignant"], float(ref["p_malignant"][0]), atol=1e-6
    )

    # encoded (PNG survives lossless → exact same pixels)
    try:
        import cv2

        ok, buf = cv2.imencode(".png", img[:, :, ::-1])
        assert ok
        data = buf.tobytes()
    except ImportError:
        import io

        from PIL import Image

        bio = io.BytesIO()
        Image.fromarray(img).save(bio, format="PNG")
        data = bio.getvalue()
    got2 = _post(f"{base}/predict", data, "image/png")
    assert got2["pred"] == got["pred"]
    np.testing.assert_allclose(
        got2["log_probs"], got["log_probs"], atol=1e-6
    )


def test_http_health_stats_and_errors(http_server):
    base, session = http_server
    with urllib.request.urlopen(f"{base}/healthz", timeout=10) as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"
    assert health["image_size"] == SIZE
    assert health["buckets"] == session.buckets

    with urllib.request.urlopen(f"{base}/stats", timeout=10) as resp:
        stats = json.loads(resp.read())
    assert "batches" in stats
    # operators watch RSS here (the relay transfer leak, docs/PERF.md)
    assert stats.get("rss_kb", 0) > 0

    # wrong-length raw body → 400, not 500
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/predict", b"abc", "application/octet-stream")
    assert e.value.code == 400

    # unknown route → 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(f"{base}/nope", timeout=10)
    assert e.value.code == 404


def test_http_concurrent_requests_coalesce(session):
    """Concurrent HTTP posts ride shared device batches: with 12
    requests in flight and a generous coalescing window, the batch
    count comes out strictly below the request count."""
    rng = np.random.default_rng(5)
    images = rng.integers(0, 255, (12, SIZE, SIZE, 3), np.uint8)
    # warm the buckets first so compile time doesn't serialize the race
    session.warm()
    ref = session.predict(images)

    batcher = DynamicBatcher(session, window_ms=200.0).start()
    server = make_http_server(batcher, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        results: dict[int, dict] = {}
        errors: list[Exception] = []

        def hit(i):
            try:
                results[i] = _post(f"{base}/predict", images[i].tobytes(),
                                   "application/octet-stream")
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors
        for i in range(12):
            assert results[i]["pred"] == int(ref["pred"][i])
        after = json.loads(urllib.request.urlopen(
            f"{base}/stats", timeout=10).read())
        assert after["requests"] == 12
        assert after["batches"] < 12
        assert after["max_coalesced"] >= 2
    finally:
        server.shutdown()
        server.server_close()
        batcher.stop()


def test_session_from_artifact(exp_folder, tmp_path):
    """The same session machinery serves a deserialized StableHLO
    artifact — no model code at the serving site."""
    from skin_image_analysis_tpu.serve import export_model

    out = str(tmp_path / "m.stablehlo")
    export_model(exp_folder, out)
    sess = InferenceSession.from_artifact(out, max_batch=4)
    assert sess.image_size == SIZE
    assert sess.class_names == ["benign", "malignant"]
    rng = np.random.default_rng(6)
    pixels = rng.integers(0, 255, (3, SIZE, SIZE, 3), np.uint8)
    got = sess.predict(pixels)
    ref = InferenceSession.from_experiment(exp_folder).predict(pixels)
    np.testing.assert_allclose(
        got["log_probs"], ref["log_probs"], atol=1e-6
    )


def test_serve_cli_usage():
    import sys

    sys.path.insert(0, "/root/repo")
    from cli import tone_bias_serve

    assert tone_bias_serve.main([]) == 1


def test_session_mesh_dp_serving(exp_folder):
    """DP serving over a device mesh: weights replicated, each batch
    sharded over the data axis — predictions identical to the
    single-device session, bucket ladder restricted to multiples of the
    data-axis extent."""
    from skin_image_analysis_tpu.config import MeshConfig
    from skin_image_analysis_tpu.parallel.mesh import create_mesh

    mesh = create_mesh(MeshConfig(data_parallel=-1, model_parallel=1))
    n = mesh.shape["data"]
    assert n == 8  # conftest pins 8 virtual CPU devices

    sharded = InferenceSession.from_experiment(
        exp_folder, max_batch=32, mesh=mesh)
    assert sharded.buckets == [8, 16, 32]
    plain = InferenceSession.from_experiment(exp_folder, max_batch=32)

    rng = np.random.default_rng(9)
    for nrows in (3, 8, 20):  # pads to 8 / exact / pads to 32
        pixels = rng.integers(0, 255, (nrows, SIZE, SIZE, 3), np.uint8)
        got = sharded.predict(pixels)
        ref = plain.predict(pixels)
        np.testing.assert_allclose(
            got["log_probs"], ref["log_probs"], atol=1e-5
        )
        np.testing.assert_array_equal(got["pred"], ref["pred"])
    assert sharded.compiled <= {8, 16, 32}

    # an unshardable cap errors loudly
    with pytest.raises(ValueError, match="cannot shard"):
        InferenceSession.from_experiment(exp_folder, max_batch=4, mesh=mesh)


def test_http_predict_batch(http_server):
    """Pre-batched clients POST one raw [N,S,S,C] body to
    /predict_batch and get arrays back — matching per-image results."""
    base, session = http_server
    rng = np.random.default_rng(11)
    pixels = rng.integers(0, 255, (5, SIZE, SIZE, 3), np.uint8)
    got = _post(f"{base}/predict_batch", pixels.tobytes(),
                "application/octet-stream")
    assert len(got["pred"]) == 5
    ref = session.predict(pixels)
    assert got["pred"] == [int(v) for v in ref["pred"]]
    np.testing.assert_allclose(
        got["p_malignant"], np.asarray(ref["p_malignant"]), atol=1e-6
    )
    assert all(c in ("benign", "malignant") for c in got["class"])

    # misaligned body -> 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/predict_batch", b"xy", "application/octet-stream")
    assert e.value.code == 400


def test_http_keepalive_across_requests_and_errors(http_server):
    """The handler speaks HTTP/1.1: one TCP connection serves many
    requests, and an error response (whose body WAS read) leaves the
    connection usable for the next request."""
    import http.client

    base, session = http_server
    host, port = base.removeprefix("http://").split(":")
    rng = np.random.default_rng(12)
    img = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)

    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        # request 1: success
        conn.request("POST", "/predict", img.tobytes(),
                     {"Content-Type": "application/octet-stream"})
        r1 = conn.getresponse()
        body1 = json.loads(r1.read())
        assert r1.status == 200 and r1.version == 11
        assert not r1.will_close  # keep-alive negotiated

        # request 2 on the SAME socket: a client error (wrong-length raw
        # body) — the server read the body before rejecting, so the
        # stream stays aligned
        sock_before = conn.sock
        assert sock_before is not None
        conn.request("POST", "/predict", b"abc",
                     {"Content-Type": "application/octet-stream"})
        r2 = conn.getresponse()
        assert r2.status == 400
        json.loads(r2.read())

        # request 3, still the same socket: success again
        assert conn.sock is sock_before
        conn.request("POST", "/predict", img.tobytes(),
                     {"Content-Type": "application/octet-stream"})
        r3 = conn.getresponse()
        body3 = json.loads(r3.read())
        assert r3.status == 200
        assert body3["pred"] == body1["pred"]
    finally:
        conn.close()


def test_http_body_guards(session):
    """Malformed uploads get clean client errors, not pinned threads:
    a half-closed truncated body → 400, an absurd Content-Length → 413,
    and a client that STALLS mid-upload → 408 after the read timeout
    (pre-fix, the blocking rfile.read() held the handler forever)."""
    import socket

    batcher = DynamicBatcher(session, window_ms=1.0).start()
    server = make_http_server(batcher, host="127.0.0.1", port=0,
                              read_timeout=1.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    row = SIZE * SIZE * 3
    try:
        def raw_post(body_sent: bytes, claimed_len: int,
                     stall: bool = False) -> int:
            s = socket.create_connection(("127.0.0.1", port), timeout=30)
            try:
                head = (f"POST /predict HTTP/1.1\r\n"
                        f"Host: x\r\nContent-Length: {claimed_len}\r\n"
                        f"Content-Type: application/octet-stream"
                        f"\r\n\r\n").encode()
                s.sendall(head + body_sent)
                if not stall:
                    s.shutdown(socket.SHUT_WR)  # half-close: EOF mid-body
                status = int(s.recv(64).split(b" ")[1])
                return status
            finally:
                s.close()

        assert raw_post(b"\0" * 100, claimed_len=row) == 400  # truncated
        assert raw_post(b"", claimed_len=1 << 29) == 413      # oversized
        # stalled: no EOF, no more bytes — the 1 s socket timeout fires
        assert raw_post(b"\0" * 100, claimed_len=row, stall=True) == 408

        # the daemon is still fully serviceable afterwards
        rng = np.random.default_rng(13)
        img = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)
        got = _post(f"http://127.0.0.1:{port}/predict", img.tobytes(),
                    "application/octet-stream")
        assert got["class"] in ("benign", "malignant")
    finally:
        server.shutdown()
        server.server_close()
        batcher.stop()


# -- hot reload (trainer-writes / server-reloads) -------------------------


def _make_exp(folder, seed: int, conv=(4, 8)) -> None:
    """A minimal experiment folder with seed-determined weights."""
    import os

    cfg = ModelConfig(
        conv_features=conv, linear_features=(8,),
        dropout=(0.0,) * 1, image_size=SIZE, compute_dtype="float32",
    )
    state, _ = create_train_state(
        cfg, OptimConfig(learning_rate=1e-3), jax.random.key(seed),
        batch_size=2,
    )
    os.makedirs(folder, exist_ok=True)
    ckpt_lib.save_model(
        str(folder) + "/" + ckpt_lib.MODEL_FILENAME, cfg, state.params,
        state.batch_stats,
    )


def test_hot_reload_swaps_weights_without_recompile(tmp_path):
    folder = tmp_path / "exp"
    _make_exp(folder, seed=1)
    sess = InferenceSession.from_experiment(str(folder), max_batch=4)
    rng = np.random.default_rng(20)
    pixels = rng.integers(0, 255, (3, SIZE, SIZE, 3), np.uint8)
    before = sess.predict(pixels)

    # the trainer writes a new same-architecture checkpoint in place
    _make_exp(folder, seed=2)
    n_compiles = sess._jit._cache_size()
    info = sess.reload_weights()
    assert info["reloads"] == 1 and sess.reloads == 1

    after = sess.predict(pixels)
    # new weights actually serve ...
    assert not np.allclose(before["log_probs"], after["log_probs"])
    # ... matching a fresh session over the new checkpoint ...
    ref = InferenceSession.from_experiment(str(folder)).predict(pixels)
    np.testing.assert_allclose(
        after["log_probs"], ref["log_probs"], atol=1e-6)
    # ... and NOT ONE bucket recompiled (the whole point: through the
    # remote-compile relay each recompile is 30-90 s of downtime).
    # reload_weights(warm=True) itself predicts on the smallest
    # compiled bucket, which must also hit the cache.
    assert sess._jit._cache_size() == n_compiles


def test_hot_reload_rejects_incompatible_and_keeps_serving(tmp_path):
    folder = tmp_path / "exp"
    _make_exp(folder, seed=1)
    sess = InferenceSession.from_experiment(str(folder), max_batch=4)
    rng = np.random.default_rng(21)
    pixels = rng.integers(0, 255, (2, SIZE, SIZE, 3), np.uint8)
    before = sess.predict(pixels)

    # different architecture in another folder: refused loudly
    other = tmp_path / "other"
    _make_exp(other, seed=3, conv=(8, 8))
    with pytest.raises(ValueError, match="architecture differs"):
        sess.reload_weights(str(other))

    # a corrupt in-place artifact: refused, old weights keep serving
    (folder / ckpt_lib.MODEL_FILENAME).write_bytes(b"not a checkpoint")
    with pytest.raises(ValueError):
        sess.reload_weights()
    assert sess.reloads == 0
    again = sess.predict(pixels)
    np.testing.assert_allclose(
        before["log_probs"], again["log_probs"], atol=1e-6)


def test_hot_reload_checks_convention_without_train_config(tmp_path):
    """A target folder with NO train_config.json trained under the
    default convention (plain [0,1] floats) — reloading it into a
    session compiled with a different input convention must be refused.
    Previously the mismatch checks were skipped entirely when the
    config file was absent, silently hot-swapping weights trained
    under a different convention."""
    import json

    src = tmp_path / "exp"
    _make_exp(src, seed=1)
    (src / "train_config.json").write_text(json.dumps(
        {"data": {"input_affine": [[2.0, 2.0, 2.0], [-1.0, -1.0, -1.0]]}}
    ))
    sess = InferenceSession.from_experiment(str(src), max_batch=4)
    assert sess._input_affine is not None

    bare = tmp_path / "bare"
    _make_exp(bare, seed=2)  # same architecture, no train_config.json
    with pytest.raises(ValueError, match="input_affine"):
        sess.reload_weights(str(bare))
    assert sess.reloads == 0


def test_artifact_session_cannot_hot_reload(exp_folder, tmp_path):
    from skin_image_analysis_tpu.serve import export_model

    out = str(tmp_path / "m.stablehlo")
    export_model(exp_folder, out)
    sess = InferenceSession.from_artifact(out, max_batch=4)
    with pytest.raises(RuntimeError, match="embedded"):
        sess.reload_weights()


def test_hot_reload_mesh_session(tmp_path):
    """Reload keeps the replicated weight sharding on a DP mesh."""
    from skin_image_analysis_tpu.config import MeshConfig
    from skin_image_analysis_tpu.parallel.mesh import create_mesh

    folder = tmp_path / "exp"
    _make_exp(folder, seed=1)
    mesh = create_mesh(MeshConfig(data_parallel=-1, model_parallel=1))
    sess = InferenceSession.from_experiment(
        str(folder), max_batch=16, mesh=mesh)
    _make_exp(folder, seed=4)
    sess.reload_weights()
    rng = np.random.default_rng(22)
    pixels = rng.integers(0, 255, (8, SIZE, SIZE, 3), np.uint8)
    got = sess.predict(pixels)
    ref = InferenceSession.from_experiment(str(folder)).predict(pixels)
    np.testing.assert_allclose(
        got["log_probs"], ref["log_probs"], atol=1e-5)


def test_http_reload_endpoint(tmp_path):
    folder = tmp_path / "exp"
    _make_exp(folder, seed=1)
    sess = InferenceSession.from_experiment(str(folder), max_batch=4)
    batcher = DynamicBatcher(sess, window_ms=1.0).start()
    server = make_http_server(batcher, host="127.0.0.1", port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    rng = np.random.default_rng(23)
    img = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)
    try:
        r1 = _post(f"{base}/predict", img.tobytes(),
                   "application/octet-stream")

        _make_exp(folder, seed=5)
        got = _post(f"{base}/reload", b"", "application/json")
        assert got["status"] == "reloaded" and got["reloads"] == 1

        r2 = _post(f"{base}/predict", img.tobytes(),
                   "application/octet-stream")
        assert r2["log_probs"] != r1["log_probs"]

        with urllib.request.urlopen(f"{base}/healthz", timeout=10) as resp:
            assert json.loads(resp.read())["reloads"] == 1

        # a different folder is refused by default (403) — the endpoint
        # must not be a load-anything-from-disk surface
        other = tmp_path / "other"
        _make_exp(other, seed=6)
        body = json.dumps({"folder": str(other)}).encode()
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base}/reload", body, "application/json")
        assert e.value.code == 403

        # malformed JSON body -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(f"{base}/reload", b"{nope", "application/json")
        assert e.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        batcher.stop()


def test_http_reload_any_allows_other_folder(tmp_path):
    folder = tmp_path / "exp"
    other = tmp_path / "other"
    _make_exp(folder, seed=1)
    _make_exp(other, seed=7)
    sess = InferenceSession.from_experiment(str(folder), max_batch=4)
    batcher = DynamicBatcher(sess, window_ms=1.0).start()
    server = make_http_server(batcher, host="127.0.0.1", port=0,
                              reload_any=True)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        body = json.dumps({"folder": str(other)}).encode()
        got = _post(f"{base}/reload", body, "application/json")
        assert got["status"] == "reloaded"
        rng = np.random.default_rng(24)
        pixels = rng.integers(0, 255, (2, SIZE, SIZE, 3), np.uint8)
        ref = InferenceSession.from_experiment(str(other)).predict(pixels)
        np.testing.assert_allclose(
            sess.predict(pixels)["log_probs"], ref["log_probs"],
            atol=1e-6)
    finally:
        server.shutdown()
        server.server_close()
        batcher.stop()


def test_reload_watcher_auto_swaps(tmp_path):
    """The mtime watcher picks up a new checkpoint and hot-swaps it;
    an incompatible artifact is refused once and the old weights keep
    serving."""
    import time as _time

    from skin_image_analysis_tpu.serve.server import start_reload_watcher

    folder = tmp_path / "exp"
    _make_exp(folder, seed=1)
    sess = InferenceSession.from_experiment(str(folder), max_batch=4)
    rng = np.random.default_rng(30)
    pixels = rng.integers(0, 255, (2, SIZE, SIZE, 3), np.uint8)
    before = sess.predict(pixels)

    thread, stop = start_reload_watcher(sess, interval_s=0.05,
                                        verbose=False)
    try:
        _make_exp(folder, seed=8)  # trainer writes a new checkpoint
        deadline = _time.time() + 20
        while sess.reloads < 1 and _time.time() < deadline:
            _time.sleep(0.05)
        assert sess.reloads == 1
        after = sess.predict(pixels)
        assert not np.allclose(before["log_probs"], after["log_probs"])

        # an incompatible artifact appears: refused, old weights serve on
        (folder / ckpt_lib.MODEL_FILENAME).write_bytes(b"junk")
        _time.sleep(0.3)
        assert sess.reloads == 1
        still = sess.predict(pixels)
        np.testing.assert_allclose(
            after["log_probs"], still["log_probs"], atol=1e-6)
    finally:
        stop.set()
        thread.join(timeout=5)


def test_session_applies_input_affine(tmp_path):
    """A folder whose train_config.json carries data.input_affine (an
    imported EfficientNetV2-S-style artifact) serves through the affine:
    the program's log-probs equal a direct forward on affine-transformed
    pixels, and hot-reload refuses an affine mismatch."""
    from skin_image_analysis_tpu.models import build_model

    folder = tmp_path / "affine_exp"
    folder.mkdir()
    cfg = ModelConfig(
        conv_features=(4, 8), linear_features=(8,), dropout=(0.0,),
        image_size=SIZE, compute_dtype="float32",
    )
    state, _ = create_train_state(
        cfg, OptimConfig(learning_rate=1e-3), jax.random.key(1),
        batch_size=2,
    )
    ckpt_lib.save_model(
        str(folder / ckpt_lib.MODEL_FILENAME), cfg, state.params,
        state.batch_stats,
    )
    affine = [[255.0 / 128.0] * 3, [-1.0] * 3]
    with open(str(folder / "train_config.json"), "w") as f:
        json.dump({"data": {"input_affine": affine}}, f)

    sess = InferenceSession.from_experiment(str(folder), max_batch=4)
    rng = np.random.default_rng(5)
    pixels = rng.integers(0, 255, (2, SIZE, SIZE, 3), np.uint8)
    out = sess.predict(pixels)

    x = pixels.astype(np.float32) / 128.0 - 1.0
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    want = np.asarray(
        build_model(cfg).apply(variables, x, train=False)
    )
    np.testing.assert_allclose(out["log_probs"], want, atol=1e-5)

    # a checkpoint trained WITHOUT the affine must not hot-swap in
    other = tmp_path / "no_affine_exp"
    other.mkdir()
    ckpt_lib.save_model(
        str(other / ckpt_lib.MODEL_FILENAME), cfg, state.params,
        state.batch_stats,
    )
    with open(str(other / "train_config.json"), "w") as f:
        json.dump({"data": {}}, f)
    with pytest.raises(ValueError, match="input_affine"):
        sess.reload_weights(str(other))


def test_session_best_checkpoint(tmp_path):
    """--best serving: model_filename picks session_model_best.msgpack,
    predictions differ from the final checkpoint, and reload tracks the
    same file. Missing best file is refused loudly by the CLI helper."""
    folder = str(tmp_path / "bexp")
    _make_exp(folder, seed=1)
    import os
    import shutil

    # fabricate a DIFFERENT "best" checkpoint (other seed)
    other = str(tmp_path / "other")
    _make_exp(other, seed=2)
    shutil.copy(os.path.join(other, ckpt_lib.MODEL_FILENAME),
                os.path.join(folder, "session_model_best.msgpack"))

    rng = np.random.default_rng(3)
    px = rng.integers(0, 255, (2, SIZE, SIZE, 3), np.uint8)
    final = InferenceSession.from_experiment(folder, max_batch=2)
    best = InferenceSession.from_experiment(
        folder, max_batch=2, model_filename="session_model_best.msgpack")
    assert best.model_filename == "session_model_best.msgpack"
    out_f = final.predict(px)["log_probs"]
    out_b = best.predict(px)["log_probs"]
    assert not np.allclose(out_f, out_b)

    from skin_image_analysis_tpu.cli._common import model_file

    assert model_file(folder, best=True).endswith(
        "session_model_best.msgpack")
    with pytest.raises(SystemExit, match="keep-best"):
        model_file(other, best=True)


def test_serve_cli_best_rejects_artifact(tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from cli import tone_bias_serve

    art = tmp_path / "m.stablehlo"
    art.write_bytes(b"not a program")
    with pytest.raises(SystemExit, match="experiment folders"):
        tone_bias_serve.main([str(art), "--best"])


def test_reload_watcher_tracks_best_file(tmp_path):
    """A --best session's watcher follows session_model_best.msgpack:
    a new FINAL checkpoint is ignored, a new BEST checkpoint swaps in —
    the daemon follows --keep-best improvements only."""
    import os
    import shutil
    import time as _time

    from skin_image_analysis_tpu.serve.server import start_reload_watcher

    folder = tmp_path / "exp"
    _make_exp(folder, seed=1)
    shutil.copy(os.path.join(folder, ckpt_lib.MODEL_FILENAME),
                os.path.join(folder, ckpt_lib.BEST_MODEL_FILENAME))
    sess = InferenceSession.from_experiment(
        str(folder), max_batch=4,
        model_filename=ckpt_lib.BEST_MODEL_FILENAME)
    rng = np.random.default_rng(31)
    pixels = rng.integers(0, 255, (2, SIZE, SIZE, 3), np.uint8)
    before = sess.predict(pixels)

    thread, stop = start_reload_watcher(sess, interval_s=0.05,
                                        verbose=False)
    try:
        _make_exp(folder, seed=9)  # final checkpoint only — NOT best
        _time.sleep(0.5)
        assert sess.reloads == 0  # watcher ignores the final file
        # a new BEST lands (trainer found an improvement)
        other = tmp_path / "other"
        _make_exp(other, seed=10)
        os.replace(os.path.join(other, ckpt_lib.MODEL_FILENAME),
                   os.path.join(folder, ckpt_lib.BEST_MODEL_FILENAME))
        deadline = _time.time() + 20
        while sess.reloads < 1 and _time.time() < deadline:
            _time.sleep(0.05)
        assert sess.reloads == 1
        after = sess.predict(pixels)
        assert not np.allclose(before["log_probs"], after["log_probs"])
    finally:
        stop.set()
        thread.join(timeout=5)


# -- bounded-memory recycle (--max-rss-mb) ---------------------------------


class _FakeChild:
    """Stands in for the spawned successor process in handoff tests."""

    def __init__(self, exit_code=None):
        self._exit_code = exit_code
        self.killed = False

    def poll(self):
        return self._exit_code

    def kill(self):
        self.killed = True
        self._exit_code = -9

    def wait(self, timeout=None):
        return self._exit_code


def test_recycle_handoff_retires_after_successor_ready(session):
    """RSS over the predictive trigger line (below the cap) → successor
    spawned with the listening socket + readiness pipe; the OLD server
    keeps accepting until the ready byte lands, then retires: accept
    loop stops, draining responses close connections, queued work
    completes. Nothing is dropped."""
    from skin_image_analysis_tpu.serve.server import (
        RecycleMonitor,
        make_http_server,
    )

    batcher = DynamicBatcher(session, window_ms=1.0).start()
    server = make_http_server(batcher, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    spawns: list[tuple] = []
    ready_w: list[int] = []

    def spawn_fn(argv, pass_fds, env):
        # simulate fd inheritance: hold a dup of the write pipe like a
        # real child would, so the monitor's own close doesn't EOF it
        ready_w.append(os.dup(pass_fds[1]))
        spawns.append((list(argv), tuple(pass_fds), dict(env)))
        return _FakeChild()

    # growing-then-plateau RSS: the ramp gives the monitor a live leak
    # estimate (predictive trigger fires below the cap), the plateau at
    # 900 kB stays under the 1024 kB cap so the old server must keep
    # accepting through the whole handoff
    ticks = iter(range(10_000))

    monitor = RecycleMonitor(
        server, batcher, max_rss_mb=1,
        argv=["cli/tone_bias_serve.py", "exp", "--port", "0",
              "--listen-fd", "99", "--ready-fd", "98"],
        interval_s=0.05, grace_s=2.0,
        rss_fn=lambda: min(300 + 100 * next(ticks), 900),
        spawn_fn=spawn_fn, verbose=False,
    ).start()

    # wait for the spawn; the old server must STILL be accepting while
    # the successor warms (the whole point of the handoff)
    for _ in range(100):
        if spawns:
            break
        threading.Event().wait(0.05)
    assert spawns and not monitor.retiring
    rng = np.random.default_rng(0)
    port = server.socket.getsockname()[1]
    img = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)
    got = _post(f"http://127.0.0.1:{port}/predict", img.tobytes(),
                "application/octet-stream")
    assert got["class"] in ("benign", "malignant")

    # a request already submitted must complete through the retirement
    fut = batcher.submit(img)

    os.write(ready_w[0], b"R")  # successor signals: accepting now
    os.close(ready_w[0])
    t.join(timeout=10)  # monitor's shutdown() stops serve_forever
    assert not t.is_alive() and monitor.triggered and monitor.retiring
    assert server.draining
    # predictive: the handoff started BELOW the stated cap
    assert monitor.trigger_rss_kb and monitor.trigger_rss_kb < 1024
    assert monitor.trigger_rss_kb > monitor.max_rss_kb // 2 - 1

    monitor.finish_retire()
    res = fut.result(timeout=10)  # drained, not dropped
    assert "pred" in res
    with pytest.raises(RuntimeError, match="stopped"):
        batcher.submit(img)

    argv, pass_fds, env = spawns[0]
    fd = server.socket.fileno()
    # stale --listen-fd/--ready-fd pairs replaced with the live fds
    assert "99" not in argv and "98" not in argv
    i = argv.index("--listen-fd")
    assert argv[i + 1] == str(fd) and pass_fds[0] == fd
    j = argv.index("--ready-fd")
    assert argv[j + 1] == str(pass_fds[1])
    assert env["SIA_SERVE_RECYCLES"] == "1"
    assert "SIA_SERVE_RECYCLED_AT" in env
    # the listening socket is still open (the successor owns it now)
    assert server.socket.getsockname()[1] != 0
    server.server_close()


def test_recycle_predictive_threshold_math(session):
    """threshold_kb(): cap when no leak observed; cap − leak×safety×warm
    once a rate is estimated; clamped at cap/2 (undersized-cap floor)."""
    from skin_image_analysis_tpu.serve.server import (
        RecycleMonitor,
        make_http_server,
    )

    batcher = DynamicBatcher(session, window_ms=1.0).start()
    server = make_http_server(batcher, "127.0.0.1", 0)
    try:
        monitor = RecycleMonitor(
            server, batcher, max_rss_mb=100,  # cap 102400 kB
            argv=["x"], warm_s=100.0, safety=1.5, leak_alpha=1.0,
            rss_fn=lambda: None, verbose=False,
        )
        # no samples: trigger at the cap itself
        assert monitor.threshold_kb() == 102400
        # two samples 1 s apart, +200 kB → 200 kB/s (alpha=1 adopts it)
        monitor._last_sample = (0.0, 1000)
        now = monitor._last_sample[0]
        import time as _time

        real_monotonic = _time.monotonic
        _time.monotonic = lambda: now + 1.0
        try:
            monitor._observe(1200)
        finally:
            _time.monotonic = real_monotonic
        assert monitor.leak_kb_s == pytest.approx(200.0)
        # 102400 − 200×1.5×100 = 72400
        assert monitor.threshold_kb() == 72400
        # a huge warm clamps at cap/2 and flags the cap as undersized
        monitor.warm_s = 10_000.0
        assert monitor.threshold_kb() == 51200
    finally:
        server.server_close()
        batcher.stop()


def test_recycle_stats_surface(session):
    """GET /stats exposes the live predictive-recycle state (trigger
    line, leak estimate, warm budget) when --max-rss-mb is armed."""
    import urllib.request

    from skin_image_analysis_tpu.serve.server import (
        RecycleMonitor,
        make_http_server,
    )

    batcher = DynamicBatcher(session, window_ms=1.0).start()
    server = make_http_server(batcher, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        monitor = RecycleMonitor(
            server, batcher, max_rss_mb=4096, argv=["x"],
            warm_s=120.0, rss_fn=lambda: 1000, verbose=False,
        )
        server.recycle_monitor = monitor  # serve_http wires this
        port = server.socket.getsockname()[1]
        stats = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=10).read())
        rec = stats["recycle"]
        assert rec["cap_kb"] == 4096 * 1024
        assert rec["trigger_kb"] == monitor.threshold_kb()
        assert rec["warm_s"] == 120.0
        assert rec["safety"] == 1.5
        assert rec["leak_kb_s"] == 0.0
    finally:
        server.shutdown()
        t.join(timeout=10)
        server.server_close()
        batcher.stop()


def test_recycle_cap_pauses_then_retires(session):
    """RSS reaching the STATED cap during a slow handoff pauses the
    accept loop (connections queue in the backlog) — the cap holds as
    an actual bound; when the successor then becomes ready the old
    process retires without a second shutdown."""
    from skin_image_analysis_tpu.serve.server import (
        RecycleMonitor,
        make_http_server,
    )

    batcher = DynamicBatcher(session, window_ms=1.0).start()
    server = make_http_server(batcher, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    ready_w: list[int] = []

    def spawn_fn(argv, pass_fds, env):
        ready_w.append(os.dup(pass_fds[1]))
        return _FakeChild()

    monitor = RecycleMonitor(
        server, batcher, max_rss_mb=1,  # real RSS: always over the cap
        argv=["cli/tone_bias_serve.py", "exp"],
        interval_s=0.05, grace_s=2.0, handoff_timeout_s=30.0,
        spawn_fn=spawn_fn, verbose=False,
    ).start()

    # the cap pause fires on the first 1 s handoff tick: accept loop
    # stops AND the server drains (keep-alive clients would otherwise
    # keep leaking straight through a paused accept loop — measured)
    t.join(timeout=15)
    assert not t.is_alive() and monitor.hard_stopped
    assert server.draining  # keep-alive connections get Connection: close
    assert not monitor.retiring  # successor not ready yet

    os.write(ready_w[0], b"R")
    os.close(ready_w[0])
    for _ in range(100):
        if monitor.retiring:
            break
        threading.Event().wait(0.05)
    assert monitor.retiring and server.draining
    assert monitor.should_resume() is False  # retire, don't resume
    monitor.finish_retire()
    server.server_close()


def test_recycle_cap_resumes_on_failed_handoff(session):
    """Cap-paused accept loop + successor death → should_resume()
    hands the accept loop back and queued/new connections are served
    again (availability is never sacrificed to the recycle)."""
    from skin_image_analysis_tpu.serve.server import (
        RecycleMonitor,
        make_http_server,
    )

    batcher = DynamicBatcher(session, window_ms=1.0).start()
    server = make_http_server(batcher, "127.0.0.1", 0)
    port = server.socket.getsockname()[1]

    children: list[_FakeChild] = []
    held_pipes: list[int] = []

    def spawn_fn(argv, pass_fds, env):
        # hold the ready pipe open like a live child would, but never
        # write it: the handoff must fail by TIMEOUT, not pipe EOF
        held_pipes.append(os.dup(pass_fds[1]))
        children.append(_FakeChild())
        return children[-1]

    monitor = RecycleMonitor(
        server, batcher, max_rss_mb=1,
        argv=["cli/tone_bias_serve.py", "exp"],
        interval_s=0.05, grace_s=2.0, handoff_timeout_s=2.5,
        cooldown_s=300.0,  # no second attempt inside this test
        spawn_fn=spawn_fn, verbose=False,
    ).start()

    served = threading.Event()

    def serve_loop():  # serve_http's main-thread structure
        while True:
            server.serve_forever()
            if monitor.should_resume():
                served.set()
                continue
            break

    t = threading.Thread(target=serve_loop, daemon=True)
    t.start()
    try:
        # cap stop → successor times out at 2.5 s → resume; the
        # cap-pause drain flag must be cleared again (responses no
        # longer tell clients to disconnect)
        assert served.wait(timeout=30)
        assert children and children[0].killed
        assert monitor.handoffs_failed == 1 and not monitor.retiring
        assert not server.draining

        rng = np.random.default_rng(2)
        img = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)
        got = _post(f"http://127.0.0.1:{port}/predict", img.tobytes(),
                    "application/octet-stream")
        assert got["class"] in ("benign", "malignant")
        monitor.stop()
    finally:
        for fd in held_pipes:
            os.close(fd)
        server.shutdown()
        t.join(timeout=10)
        server.server_close()
        batcher.stop()


def test_recycle_handoff_failure_keeps_serving(session):
    """A successor that dies before becoming ready must NOT take the
    old daemon down: the monitor reaps it, keeps serving, and retries
    after the cooldown."""
    from skin_image_analysis_tpu.serve.server import (
        RecycleMonitor,
        make_http_server,
    )

    batcher = DynamicBatcher(session, window_ms=1.0).start()
    server = make_http_server(batcher, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        spawned = threading.Event()

        def spawn_fn(argv, pass_fds, env):
            spawned.set()
            return _FakeChild(exit_code=1)  # dies immediately

        monitor = RecycleMonitor(
            server, batcher, max_rss_mb=1,
            argv=["cli/tone_bias_serve.py", "exp"],
            interval_s=0.05, grace_s=2.0, cooldown_s=30.0,
            spawn_fn=spawn_fn, verbose=False,
        ).start()

        assert spawned.wait(timeout=10)
        for _ in range(100):  # the failure is recorded shortly after
            if monitor.handoffs_failed:
                break
            threading.Event().wait(0.05)
        assert monitor.handoffs_failed >= 1 and not monitor.retiring
        assert not server.draining

        # still serving after the failed handoff
        rng = np.random.default_rng(1)
        port = server.socket.getsockname()[1]
        img = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)
        got = _post(f"http://127.0.0.1:{port}/predict", img.tobytes(),
                    "application/octet-stream")
        assert got["class"] in ("benign", "malignant")
        monitor.stop()
    finally:
        server.shutdown()
        server.server_close()
        batcher.stop()


def test_listen_fd_adoption(session):
    """A recycled process adopts the inherited, already-listening
    socket (bind_and_activate=False) and serves on it."""
    import socket

    from skin_image_analysis_tpu.serve.server import make_http_server

    lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(64)
    port = lsock.getsockname()[1]
    fd = lsock.detach()  # hand the fd over, as across an exec

    batcher = DynamicBatcher(session, window_ms=1.0).start()
    server = make_http_server(batcher, "127.0.0.1", 0, listen_fd=fd)
    assert server.server_port == port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(1)
        img = rng.integers(0, 255, (SIZE, SIZE, 3), np.uint8)
        got = _post(f"http://127.0.0.1:{port}/predict", img.tobytes(),
                    "application/octet-stream")
        assert got["class"] in ("benign", "malignant")
        health = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10).read())
        assert "recycles" in health
    finally:
        server.shutdown()
        server.server_close()
        batcher.stop()


def test_prefer_warm_bucket_and_background_converge(exp_folder):
    """A batch whose exact bucket is COLD serves immediately on a
    warmed larger bucket (a first-hit compile under the serving lock
    stalls ALL traffic 30-90 s through the relay), and the exact
    bucket compiles in the background so the steady state converges
    to it (its padded rows also pad the host->device transfer)."""
    import time

    sess = InferenceSession.from_experiment(exp_folder, max_batch=8)
    sess.warm([1, 8])
    assert sess.compiled == {1, 8}

    fg, bg = [], []
    orig = sess._jit
    main = threading.current_thread()

    def spy(*args):
        (fg if threading.current_thread() is main else bg).append(
            args[-1].shape[0])
        return orig(*args)

    sess._jit = spy
    rng = np.random.default_rng(5)
    pixels = rng.integers(0, 255, (3, SIZE, SIZE, 3), np.uint8)
    out = sess.predict(pixels)
    assert out["pred"].shape == (3,)
    # the foreground call rode the warmed 8-bucket, not a cold 4
    assert fg == [8]
    # the background warm converges the exact bucket (off-main thread)
    deadline = time.time() + 60
    while 4 not in sess.compiled and time.time() < deadline:
        time.sleep(0.2)
    assert 4 in sess.compiled and bg == [4]
    # steady state now uses the exact bucket
    fg.clear()
    ref = sess.predict(pixels)
    assert fg == [4]
    np.testing.assert_allclose(out["log_probs"], ref["log_probs"],
                               atol=1e-5)

    # with NO warmed bucket that can hold the batch, the exact bucket
    # compiles inline as before
    cold = InferenceSession.from_experiment(exp_folder, max_batch=8)
    cold.warm([1])
    out2 = cold.predict(pixels)
    assert out2["pred"].shape == (3,) and 4 in cold.compiled
