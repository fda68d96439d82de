"""Serving API: checkpoint -> Recognizer, params-only export round-trip,
transcribe/stream surfaces."""

import numpy as np

import jax.numpy as jnp

from rnntransducer_tpu.config import (
    AudioConfig, Config, DataConfig, JointNetConfig, ModelConfig,
    PredNetConfig, TrainConfig, TransNetConfig,
)
from rnntransducer_tpu.data import SyntheticAudioDataset
from rnntransducer_tpu.serve import Recognizer, export_params
from rnntransducer_tpu.train import Trainer
from rnntransducer_tpu.utils.audio_io import write_wav


def _cfg(tmp_path):
    return Config(
        data=DataConfig(audio=AudioConfig(spec_augment=False),
                        audio_buckets=(64, 128), label_buckets=(16, 24)),
        model=ModelConfig(
            transnet=TransNetConfig(input_size=80, hidden_size=16,
                                    output_size=12, num_layers=1,
                                    rnn_type="lstm", dropout=0.0,
                                    bidirectional=False),  # streamable
            prednet=PredNetConfig(embedding_size=72, hidden_size=16,
                                  output_size=12, num_layers=1,
                                  rnn_type="lstm", dropout=0.0),
            jointnet=JointNetConfig(num_classes=72),
        ),
        train=TrainConfig(max_steps=2, per_device_train_batch_size=1,
                          precision="fp32", log_every_steps=1,
                          checkpoint_dir=str(tmp_path / "ckpt")),
    )


def test_recognizer_end_to_end(tmp_path):
    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(6, AudioConfig(), min_sec=0.3, max_sec=0.8,
                               min_labels=3, max_labels=8, seed=0)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    rng = np.random.RandomState(0)
    wav_path = str(tmp_path / "a.wav")
    write_wav(wav_path, rng.randn(8000) * 0.1)

    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), beam_width=2)
    text = rec.transcribe(wav_path)
    assert isinstance(text, str)
    texts = rec.transcribe_batch([wav_path, rng.randn(4800).astype(np.float32)])
    assert len(texts) == 2

    # greedy mode and streaming session
    rec_g = Recognizer.from_checkpoint(str(tmp_path / "ckpt"),
                                       decoder="greedy")
    _ = rec_g.transcribe(wav_path)

    # SWA-style checkpoint averaging at the serving entry point: with max_steps=2
    # the manager retains both steps; the averaged model must decode
    rec_avg = Recognizer.from_checkpoint(str(tmp_path / "ckpt"),
                                         average_k=2, decoder="greedy")
    assert isinstance(rec_avg.transcribe(wav_path), str)
    session = rec_g.stream(chunk_frames=16)
    session.feed(rng.randn(3200).astype(np.float32))
    session.flush()

    # params-only export round-trip gives identical transcriptions
    out = export_params(str(tmp_path / "ckpt"), str(tmp_path / "export"))
    rec2 = Recognizer.from_params(out, beam_width=2)
    assert rec2.transcribe(wav_path) == text
    import os
    assert os.path.exists(os.path.join(out, "params.msgpack"))


def test_stream_session_normalization_modes(tmp_path):
    """stream() defaults to 'running' for norm-trained models, 'none'
    otherwise, and passes 'fixed' calibration through to the frontend."""
    cfg = _cfg(tmp_path)  # AudioConfig default: normalize=True
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=1)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="greedy")
    assert rec.cfg.data.audio.normalize
    s = rec.stream(chunk_frames=16)
    assert s.frontend.normalize == "running"
    s2 = rec.stream(chunk_frames=16, normalize="fixed", norm_mean=0.5,
                    norm_var=2.0)
    assert s2.frontend.normalize == "fixed"
    assert s2.frontend.norm_mean == 0.5 and s2.frontend.norm_var == 2.0
    rng = np.random.RandomState(2)
    s2.feed(rng.randn(3200).astype(np.float32))
    out = s2.flush()
    assert isinstance(out, list)


def test_streaming_socket_server(tmp_path):
    """TCP streaming service: per-chunk partials, final result, and two
    interleaved sessions with independent state."""
    import threading

    from rnntransducer_tpu.serve_socket import StreamingServer, stream_wav

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=2)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="greedy")
    rng = np.random.RandomState(1)
    wav = rng.randn(9600).astype(np.float32) * 0.1

    with StreamingServer(rec, port=0, chunk_frames=16) as server:
        partials, final = stream_wav("127.0.0.1", server.port, wav)
        assert len(partials) == 6  # 9600 / 1600 chunks, one reply each
        assert isinstance(final["final"], str)
        assert isinstance(final["tokens"], list)
        # session-equivalence: a direct session fed the same int16-quantized
        # audio in the same 1600-sample pieces matches exactly.  (Same pieces
        # matters: this model is norm-trained, so the session defaults to
        # "running" normalization, whose early-frame statistics depend on
        # feed granularity by design.)
        wav_q = (np.clip(wav * 32768.0, -32768, 32767).astype("<i2")
                 .astype(np.float32) / 32768.0)
        direct = rec.stream(chunk_frames=16)
        for i in range(0, len(wav_q), 1600):
            direct.feed(wav_q[i:i + 1600])
        direct.flush()
        assert final["tokens"] == [int(t) for t in direct.tokens]

        # two interleaved sessions (threads) don't corrupt each other
        wav2 = rng.randn(8000).astype(np.float32) * 0.1
        out = {}

        def client(name, w):
            out[name] = stream_wav("127.0.0.1", server.port, w)

        t1 = threading.Thread(target=client, args=("a", wav))
        t2 = threading.Thread(target=client, args=("b", wav2))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert out["a"][1]["tokens"] == final["tokens"]


def test_streaming_socket_server_beam(tmp_path):
    """Beam-decoder sessions over the socket: partials poll the ranked best,
    final matches a direct beam session."""
    from rnntransducer_tpu.serve_socket import StreamingServer, stream_wav

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=4)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="beam",
                                     beam_width=2)
    rng = np.random.RandomState(3)
    wav = rng.randn(8000).astype(np.float32) * 0.1
    with StreamingServer(rec, port=0, chunk_frames=16) as server:
        partials, final = stream_wav("127.0.0.1", server.port, wav)
        assert len(partials) == 5
        assert all(isinstance(p, str) for p in partials)
        wav_q = (np.clip(wav * 32768.0, -32768, 32767).astype("<i2")
                 .astype(np.float32) / 32768.0)
        direct = rec.stream(chunk_frames=16)
        for i in range(0, len(wav_q), 1600):
            direct.feed(wav_q[i:i + 1600])
        direct.flush()
        assert final["tokens"] == [int(t) for t in direct.tokens]


def test_streaming_socket_server_batched_sessions(tmp_path):
    """Continuous batching: concurrent connections share the runner; results
    match the unbatched server for identical audio."""
    import threading

    from rnntransducer_tpu.serve_socket import StreamingServer, stream_wav

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=5)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="greedy")
    rng = np.random.RandomState(6)
    wavs = [rng.randn(8000).astype(np.float32) * 0.1 for _ in range(3)]

    with StreamingServer(rec, port=0, chunk_frames=16) as plain:
        want = [stream_wav("127.0.0.1", plain.port, w)[1]["tokens"]
                for w in wavs]

    with StreamingServer(rec, port=0, chunk_frames=16,
                         batch_sessions=4) as server:
        out = {}

        def client(i):
            out[i] = stream_wav("127.0.0.1", server.port, wavs[i])

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for i in range(3):
            assert out[i][1]["tokens"] == want[i], i
        # slots freed: more sessions than max concurrently-alive work serially
        for i in range(3):
            assert stream_wav("127.0.0.1", server.port,
                              wavs[i])[1]["tokens"] == want[i]


def test_streaming_socket_server_batched_beam(tmp_path):
    """Continuous batching with the beam decoder: batched server results
    match the unbatched beam server."""
    from rnntransducer_tpu.serve_socket import StreamingServer, stream_wav

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=6)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="beam",
                                     beam_width=2)
    rng = np.random.RandomState(8)
    wav = rng.randn(8000).astype(np.float32) * 0.1
    with StreamingServer(rec, port=0, chunk_frames=16) as plain:
        want = stream_wav("127.0.0.1", plain.port, wav)[1]["tokens"]
    with StreamingServer(rec, port=0, chunk_frames=16,
                         batch_sessions=3) as server:
        got = stream_wav("127.0.0.1", server.port, wav)[1]["tokens"]
    assert got == want


def test_streaming_socket_server_lm_fusion(tmp_path):
    """LM+hotword fusion over the socket: sessions run the host fused beam;
    final matches a direct fused session; batched mode refuses fusion."""
    import textwrap

    import pytest

    from rnntransducer_tpu.serve_socket import StreamingServer, stream_wav

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=11)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    arpa = textwrap.dedent(r"""
    \data\
    ngram 1=5

    \1-grams:
    -1.0    <s>
    -1.0    </s>
    -0.8    at
    -1.1    it
    -2.0    <unk>

    \end\
    """).strip()
    lm_path = tmp_path / "lm.arpa"
    lm_path.write_text(arpa)

    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="beam",
                                     beam_width=2, lm_path=str(lm_path),
                                     lm_weight=0.5, hotwords=["at"],
                                     hotword_weight=2.0)
    assert rec.fused
    rng = np.random.RandomState(5)
    wav = rng.randn(6400).astype(np.float32) * 0.1
    with StreamingServer(rec, port=0, chunk_frames=16) as server:
        partials, final = stream_wav("127.0.0.1", server.port, wav)
        assert all(isinstance(p, str) for p in partials)
        wav_q = (np.clip(wav * 32768.0, -32768, 32767).astype("<i2")
                 .astype(np.float32) / 32768.0)
        direct = rec.stream(chunk_frames=16)
        for i in range(0, len(wav_q), 1600):
            direct.feed(wav_q[i:i + 1600])
        direct.flush()
        assert final["tokens"] == [int(t) for t in direct.tokens]

    # fusion composes with continuous batching: batched lanes run the same
    # host fused search (wave scoring batched across lanes) and produce the
    # same final tokens as the direct fused session
    with StreamingServer(rec, port=0, chunk_frames=16,
                         batch_sessions=2) as server:
        assert server._runner.fused
        _, final_b = stream_wav("127.0.0.1", server.port, wav)
    assert final_b["tokens"] == final["tokens"]
    # ... but cannot shard over a mesh (the search is host-side)
    from rnntransducer_tpu.parallel.mesh import make_mesh
    with pytest.raises(ValueError, match="lane sharding"):
        StreamingServer(rec, port=0, batch_sessions=8, mesh=make_mesh(),
                        warmup=False)


def test_abnormal_disconnect_frees_batched_slot(tmp_path):
    """A client that vanishes mid-stream (no end marker, no flush) must not
    leak its batched-session slot: with batch_sessions=1, a clean second
    connection must still be served."""
    import socket
    import struct
    import time

    from rnntransducer_tpu.serve_socket import StreamingServer, stream_wav

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=5)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="greedy")
    rng = np.random.RandomState(6)
    wav = rng.randn(8000).astype(np.float32) * 0.1

    with StreamingServer(rec, port=0, chunk_frames=16,
                         batch_sessions=1) as server:
        runner = server._runner
        for k, attempt in enumerate(("disconnect", "odd_payload")):
            with socket.socket() as s:  # abnormal client
                s.connect(("127.0.0.1", server.port))
                pcm16 = np.clip(wav[:1600] * 32768, -32768,
                                32767).astype("<i2")
                chunk = pcm16.tobytes()
                if attempt == "odd_payload":
                    chunk = chunk[:-1]  # protocol error path
                s.sendall(struct.pack("<i", len(chunk)) + chunk)
                if attempt == "disconnect":
                    s.recv(4096)  # one partial, then vanish (no end marker)
            # wait for the handler to FINISH (not just for a free slot: a
            # lagging handler may not have opened its session yet when the
            # poll runs, then grab the slot under the next connection)
            deadline = time.time() + 30
            while time.time() < deadline and server._conns_done < k + 1:
                time.sleep(0.05)
            assert server._conns_done == k + 1, attempt
            assert len(runner._free) == 1, attempt  # slot reclaimed

        # the slot serves a clean session afterwards
        partials, final = stream_wav("127.0.0.1", server.port, wav)
        assert final["tokens"], final


def test_server_drain_waits_for_inflight(tmp_path):
    """drain(): stop accepting, but an in-flight session runs to completion
    (its client still receives the final transcript); new connections are
    refused once drain returns.  This is the serving-side preemption
    contract (the CLI calls it on SIGTERM)."""
    import json
    import socket
    import struct
    import threading
    import time

    import pytest

    from rnntransducer_tpu.serve_socket import StreamingServer

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=7)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="greedy")
    rng = np.random.RandomState(8)
    wav = rng.randn(9600).astype(np.float32) * 0.1
    pcm16 = np.clip(wav * 32768.0, -32768, 32767).astype("<i2")

    server = StreamingServer(rec, port=0, chunk_frames=16).start()
    started = threading.Event()
    out = {}

    def slow_client():
        with socket.socket() as s:
            s.connect(("127.0.0.1", server.port))
            f = s.makefile("rb")
            for i in range(0, len(pcm16), 1600):
                chunk = pcm16[i:i + 1600].tobytes()
                s.sendall(struct.pack("<i", len(chunk)) + chunk)
                json.loads(f.readline())
                started.set()
                time.sleep(0.05)  # stay in flight across the drain call
            s.sendall(struct.pack("<i", 0))
            out["final"] = json.loads(f.readline())

    t = threading.Thread(target=slow_client)
    t.start()
    assert started.wait(60), "client never got a first partial"
    assert server.drain(timeout=60) is True
    t.join(60)
    assert not t.is_alive()
    assert isinstance(out["final"]["final"], str)  # session completed
    assert out["final"]["tokens"] == [int(x) for x in out["final"]["tokens"]]
    with pytest.raises(OSError):  # listener is gone: connections refused
        with socket.socket() as s:
            s.settimeout(2)
            s.connect(("127.0.0.1", server.port))
            # some stacks accept then reset; a read must then fail
            s.sendall(struct.pack("<i", 0))
            if not s.recv(1):
                raise ConnectionResetError("closed")


def test_server_drain_timeout_reports_false(tmp_path):
    """A session that outlives the drain window must not block shutdown:
    drain() returns False and the straggler stays on its daemon thread."""
    import socket
    import struct
    import threading

    from rnntransducer_tpu.serve_socket import StreamingServer

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=9)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    rec = Recognizer.from_checkpoint(str(tmp_path / "ckpt"), decoder="greedy")
    server = StreamingServer(rec, port=0, chunk_frames=16).start()
    release = threading.Event()

    def stalled_client():
        with socket.socket() as s:
            s.connect(("127.0.0.1", server.port))
            s.sendall(struct.pack("<i", 1600 * 2))  # promise a chunk ...
            release.wait(30)  # ... but never send it until released

    t = threading.Thread(target=stalled_client)
    t.start()
    # wait until the handler picked the connection up
    import time
    deadline = time.time() + 30
    while time.time() < deadline and server._conns_started < 1:
        time.sleep(0.02)
    assert server._conns_started == 1
    assert server.drain(timeout=0.3) is False
    release.set()  # unblock; the handler finishes on its daemon thread
    t.join(30)


def test_serve_cli_sigterm_drains(tmp_path):
    """Real signal path: SIGTERM to a ``python -m
    rnntransducer_tpu.serve_socket`` subprocess mid-session drains (the
    client still gets its final) and exits 0 — the serving counterpart of
    the Trainer's preemption test.  Also exercises the CLI's --average_k
    checkpoint-averaging wiring."""
    import json
    import os
    import signal
    import socket
    import struct
    import subprocess
    import sys
    import threading
    import time

    import pytest

    pytest.importorskip("numpy")

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=11)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    p = subprocess.Popen(
        [sys.executable, "-m", "rnntransducer_tpu.serve_socket",
         "--checkpoint_dir", str(tmp_path / "ckpt"), "--port", "0",
         "--average_k", "1", "--drain_timeout", "60"],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, bufsize=1)
    try:
        line = p.stdout.readline()  # blocks until warmup + bind
        assert "streaming on" in line, line
        port = int(line.split(":")[1].split()[0])

        rng = np.random.RandomState(12)
        pcm16 = np.clip(rng.randn(9600) * 0.1 * 32768.0, -32768,
                        32767).astype("<i2")
        started = threading.Event()
        out = {}

        def slow_client():
            with socket.socket() as s:
                s.connect(("127.0.0.1", port))
                f = s.makefile("rb")
                for i in range(0, len(pcm16), 1600):
                    chunk = pcm16[i:i + 1600].tobytes()
                    s.sendall(struct.pack("<i", len(chunk)) + chunk)
                    json.loads(f.readline())
                    started.set()
                    time.sleep(0.05)
                s.sendall(struct.pack("<i", 0))
                out["final"] = json.loads(f.readline())

        t = threading.Thread(target=slow_client)
        t.start()
        assert started.wait(60)
        p.send_signal(signal.SIGTERM)  # mid-session
        t.join(60)
        assert not t.is_alive()
        assert isinstance(out["final"]["final"], str)
        stdout, stderr = p.communicate(timeout=60)
        assert p.returncode == 0, stderr[-2000:]
        assert "drained: all sessions finished" in stdout, stdout
    finally:
        if p.poll() is None:
            p.kill()
            p.communicate()


def test_recognizer_device_lm_surfaces(tmp_path):
    """device_lm_path reaches every Recognizer surface: offline batched
    beam, stream() sessions, and the batched socket runner; mutually
    exclusive with host lm_path."""
    import pytest

    from rnntransducer_tpu.serve_socket import StreamingServer

    cfg = _cfg(tmp_path)
    ds = SyntheticAudioDataset(4, AudioConfig(), min_sec=0.3, max_sec=0.6,
                               min_labels=3, max_labels=6, seed=3)
    trainer = Trainer(cfg, ds, val_dataset=None)
    trainer.fit()
    trainer.ckpt.close()

    # char bigram over jamo graphemes of the default 72 vocab
    arpa = tmp_path / "char.arpa"
    arpa.write_text("\n".join([
        "\\data\\", "ngram 1=5", "ngram 2=2", "",
        "\\1-grams:",
        "-1.0\t<s>\t-0.5", "-1.0\t</s>",
        "-0.4\tㄱ\t-0.3", "-0.7\tㄴ\t-0.2", "-1.1\tㄷ",
        "", "\\2-grams:",
        "-0.2\tㄱ ㄴ", "-0.5\tㄴ ㄱ",
        "", "\\end\\", ""]))

    rec = Recognizer.from_checkpoint(
        str(tmp_path / "ckpt"), decoder="beam_batched", beam_width=2,
        device_lm_path=str(arpa), device_lm_order=2)
    assert rec.device_lm is not None and rec.device_lm.order == 2

    rng = np.random.RandomState(5)
    texts = rec.transcribe_batch([rng.randn(4800).astype(np.float32)])
    assert len(texts) == 1 and isinstance(texts[0], str)

    sess = rec.stream(chunk_frames=16)
    assert sess._lm_table is not None  # fusion reached the session
    sess.feed(rng.randn(3200).astype(np.float32))
    assert isinstance(sess.flush(), list)

    # the batched socket runner inherits the table (no server start needed)
    srv = StreamingServer(rec, batch_sessions=2, warmup=False)
    assert srv._runner._lm_table is not None

    with pytest.raises(ValueError, match="mutually exclusive"):
        Recognizer.from_checkpoint(
            str(tmp_path / "ckpt"), decoder="beam_batched",
            device_lm_path=str(arpa), device_lm_order=2,
            lm_path=str(arpa))
    with pytest.raises(ValueError, match="beam decoder"):
        Recognizer.from_checkpoint(
            str(tmp_path / "ckpt"), decoder="greedy",
            device_lm_path=str(arpa), device_lm_order=2)
