"""Streaming recognition over TCP — the network serving layer.

The reference has **no serving layer at all** (SURVEY.md §1: "no serving
layer"); its inference surface is a one-wav script
(``/root/reference/inference.py:13-66``).  This module turns the
``Recognizer``/``StreamingRecognizer`` session API into a long-lived network
service a production client can stream microphone audio to.

Protocol (one session per TCP connection, little-endian):

    client -> server:  [int32 n][n bytes]   raw PCM chunk — int16 samples at
                                            the model sample rate
                       [int32 0]            end of stream
    server -> client:  newline-delimited JSON after every chunk:
                       {"partial": "<best text so far>"}
                       and on end of stream:
                       {"final": "<text>", "tokens": [...]}\n

Concurrency: sessions run on independent threads; device work (the chunked
encoder/decode steps) serializes through a process-wide lock — one TPU chip
executes one program at a time anyway, so the lock adds ordering, not cost.
Each connection owns its own streaming state (frontend buffer, encoder
carry, decode carry), so interleaved sessions never share state.

    server = StreamingServer(recognizer, port=0)        # 0 = ephemeral
    server.start()                                      # background thread
    ... server.port ...
    server.stop()

CLI: ``python -m rnntransducer_tpu.serve_socket --checkpoint_dir ckpts
--port 7070 [--decoder greedy|beam] [--normalize running]``.
"""

from __future__ import annotations

import contextlib
import json
import socket
import struct
import threading
from typing import Optional

import numpy as np


def _recv_exact(conn: socket.socket, n: int) -> Optional[bytes]:
    buf = b""
    while len(buf) < n:
        part = conn.recv(n - len(buf))
        if not part:
            return None
        buf += part
    return buf


class StreamingServer:
    def __init__(self, recognizer, host: str = "127.0.0.1", port: int = 0,
                 chunk_frames: Optional[int] = None, batch_sessions: int = 0,
                 mesh=None, warmup: bool = True, **session_kw):
        """batch_sessions > 0 enables continuous batching: up to that many
        concurrent connections share ONE compiled device program per tick
        (decode/session_batch) instead of one B=1 program per session;
        follows the recognizer's decoder (greedy or batched beam).
        mesh: optional 1-D device mesh — batched lanes shard across its
        devices (multi-chip serving).
        warmup: compile the batched tick/reset/fetch programs in start(),
        before the socket binds — clients never pay XLA compile."""
        self.recognizer = recognizer
        self.host = host
        self._requested_port = port
        self.chunk_frames = chunk_frames
        self.session_kw = session_kw
        self._device_lock = threading.Lock()
        # served-connection counter: lets tests (and health checks) wait for
        # an abnormal client's handler to have fully finished — a handler
        # thread can lag its client's disconnect under load, briefly holding
        # a batched-session slot after the socket is gone
        self._conns_done = 0
        self._conns_started = 0
        self._count_lock = threading.Lock()
        self._sock: Optional[socket.socket] = None
        self._thread: Optional[threading.Thread] = None
        self._running = False
        self.port: Optional[int] = None
        self._runner = None
        self._warmup = warmup
        if batch_sessions > 0:
            from rnntransducer_tpu.decode.session_batch import (
                BatchedStreamingRunner,
            )
            rec = recognizer
            cf = chunk_frames or rec.cfg.inference.streaming_chunk_frames
            fused_kw = {}
            if getattr(rec, "fused", False):
                # batched sessions + LM/hotword fusion: each lane runs the
                # host A/B search, wave scoring batches across lanes
                # (decode/session_batch fused mode)
                fused_kw = dict(
                    lm=rec.lm, hotwords=rec.hotwords,
                    hotword_weight=rec.hotword_weight,
                    tokenizer=rec.tokenizer,
                    improved=rec.cfg.inference.improved,
                    state_beam=rec.cfg.inference.state_beam,
                    expand_beam=rec.cfg.inference.expand_beam)
            self._runner = BatchedStreamingRunner(
                rec.model, rec.variables, rec.cfg.data.audio,
                max_sessions=batch_sessions, chunk_frames=cf,
                blank_id=rec.tokenizer.blank_token_id,
                max_symbols=rec.cfg.train.greedy_max_symbols,
                max_output_len=rec.max_output_len,
                decoder="beam" if rec.decoder != "greedy" else "greedy",
                beam_width=rec.beam_width, mesh=mesh,
                device_lm=getattr(rec, "device_lm", None), **fused_kw)

    # ------------------------------------------------------------- session
    def _serve_conn(self, conn: socket.socket) -> None:
        try:
            try:
                if self._runner is not None:
                    kw = {k: v for k, v in self.session_kw.items()
                          if k in ("normalize", "norm_mean", "norm_var")}
                    kw.setdefault(
                        "normalize",
                        "running" if self.recognizer.cfg.data.audio.normalize
                        else "none")
                    sess = self._runner.open(**kw)
                else:
                    sess = self.recognizer.stream(
                        chunk_frames=self.chunk_frames, **self.session_kw)
            except Exception as e:  # e.g. bidirectional encoder, slots full
                conn.sendall((json.dumps({"error": str(e)}) + "\n").encode())
                return
            # batched sessions synchronize through the runner's own
            # tick/state locks — the point of continuous batching is that
            # other connections keep buffering and polling while a tick is
            # in flight, so the process-wide device lock must NOT wrap them
            # (it would serialize all lanes).  Unbatched B=1 sessions share
            # the chip with no internal locking and keep it.
            lock = (contextlib.nullcontext() if self._runner is not None
                    else self._device_lock)
            beam = getattr(sess, "decoder", "greedy") == "beam"
            emitted: list = []  # greedy partials accumulate from feed()'s
            # returns; a .tokens poll would re-fetch the whole buffer per
            # chunk (one extra device round trip)
            try:
                while True:
                    hdr = _recv_exact(conn, 4)
                    if hdr is None:
                        return  # client vanished mid-stream: no final
                    (n,) = struct.unpack("<i", hdr)
                    if n <= 0:
                        break  # end of stream
                    payload = _recv_exact(conn, n)
                    if payload is None:
                        return
                    if n % 2:
                        conn.sendall((json.dumps(
                            {"error": f"odd payload length {n}: samples are "
                                      "int16"}) + "\n").encode())
                        return
                    pcm = np.frombuffer(payload, dtype="<i2")
                    pcm = pcm.astype(np.float32) / 32768.0
                    with lock:
                        emitted += sess.feed(pcm)
                        toks = sess.tokens if beam else emitted
                        partial = self.recognizer._decode_text(toks)
                    conn.sendall((json.dumps({"partial": partial}) + "\n")
                                 .encode())
                with lock:
                    fin = sess.flush()
                    # flush() frees a batched session's slot, so .tokens
                    # must never be read afterwards (another connection's
                    # open() can reuse the slot).  For beam, flush() returns
                    # the final ranked-best; for greedy, the trailing
                    # emission.
                    if beam:
                        tokens = list(fin)
                    else:
                        emitted += fin
                        tokens = list(emitted)
                    final = self.recognizer._decode_text(tokens)
                msg = {"final": final,
                       "tokens": [int(t) for t in tokens]}
                if not beam:  # greedy: per-token emission seconds
                    msg["times"] = [round(t, 3) for t in sess.timestamps]
                conn.sendall((json.dumps(msg) + "\n").encode())
            finally:
                # abnormal exit paths (disconnect, protocol error, feed
                # exception) must still free a batched session's slot —
                # otherwise each one leaks a lane until no client can
                # connect.  No-op after a clean flush().
                abort = getattr(sess, "abort", None)
                if abort is not None:
                    abort()
        except (ConnectionError, BrokenPipeError):
            pass
        except Exception as e:
            # never leave the client hanging on an unreplied readline
            try:
                conn.sendall((json.dumps({"error": str(e)}) + "\n").encode())
            except OSError:
                pass
        finally:
            conn.close()
            with self._count_lock:
                self._conns_done += 1

    # -------------------------------------------------------------- server
    def _accept_loop(self) -> None:
        while self._running:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return  # socket closed by stop()
            with self._count_lock:
                self._conns_started += 1
            t = threading.Thread(target=self._serve_conn, args=(conn,),
                                 daemon=True)
            t.start()

    def start(self) -> "StreamingServer":
        # compile before binding: the server is never reachable in a state
        # where a client's first chunk pays a multi-second XLA compile
        if self._warmup:
            if self._runner is not None:
                self._runner.warmup()
            else:
                # throwaway session: the B=1 chunk programs it compiles are
                # keyed by shape, so every future session reuses them
                sess = self.recognizer.stream(chunk_frames=self.chunk_frames,
                                              **self.session_kw)
                acfg = self.recognizer.cfg.data.audio
                cf = self.chunk_frames or \
                    self.recognizer.cfg.inference.streaming_chunk_frames
                hop = int(acfg.sample_rate * acfg.window_stride_sec)
                n = (cf + 2) * hop + int(acfg.sample_rate *
                                         acfg.window_size_sec)
                sess.feed(np.zeros(n, np.float32))
                sess.flush()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, self._requested_port))
        self._sock.listen(16)
        self.port = self._sock.getsockname()[1]
        self._running = True
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._running = False
        if self._sock is not None:
            # shutdown() before close(): closing an fd another thread is
            # blocked in accept() on does not reliably wake that thread, so
            # without this the accept loop leaks and join() times out
            try:
                self._sock.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass  # not connected / already shut down — fine
            try:
                self._sock.close()
            except OSError:
                pass
        if self._thread is not None:
            self._thread.join(timeout=5)
            if self._thread.is_alive():
                raise RuntimeError("StreamingServer accept loop failed to "
                                   "exit within 5 s of stop()")
            self._thread = None

    def drain(self, timeout: float = 30.0) -> bool:
        """Graceful shutdown: stop accepting new connections, then wait up
        to ``timeout`` seconds for every in-flight session to finish (its
        client receives the final transcript).  Returns True when all
        handlers completed, False on timeout (stragglers are daemon threads
        and die with the process).  This is the serving-side counterpart of
        the Trainer's SIGTERM preemption checkpoint: an orchestrator
        replacing the task sends SIGTERM, the CLI drains, clients lose no
        audio already sent."""
        import time

        self.stop()  # unbind + join the accept loop; handlers keep running
        deadline = time.monotonic() + timeout
        while True:
            with self._count_lock:
                if self._conns_done >= self._conns_started:
                    return True
            if time.monotonic() >= deadline:
                with self._count_lock:
                    return self._conns_done >= self._conns_started
            time.sleep(0.02)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


# ------------------------------------------------------------------ client
def stream_wav(host: str, port: int, wav: np.ndarray,
               chunk_samples: int = 1600):
    """Reference client: stream float32 PCM in int16 chunks; returns
    (partials list, final dict)."""
    pcm16 = np.clip(wav * 32768.0, -32768, 32767).astype("<i2")
    partials, final = [], None
    with socket.socket() as s:
        s.connect((host, port))
        f = s.makefile("rb")
        for i in range(0, len(pcm16), chunk_samples):
            chunk = pcm16[i:i + chunk_samples].tobytes()
            s.sendall(struct.pack("<i", len(chunk)) + chunk)
            msg = json.loads(f.readline())
            if "error" in msg:  # slots full, odd payload, bidi encoder, ...
                raise RuntimeError(msg["error"])
            partials.append(msg["partial"])
        s.sendall(struct.pack("<i", 0))
        final = json.loads(f.readline())
        if "error" in final:
            raise RuntimeError(final["error"])
    return partials, final


def main():
    import argparse
    import os

    import jax

    # JAX_PLATFORMS=cpu must mean cpu even under PJRT plugins that ignore
    # the env var (same pinning as train.py / inference.py)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from rnntransducer_tpu.serve import Recognizer

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint_dir", type=str, required=True)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=7070)
    p.add_argument("--decoder", type=str, default="greedy",
                   choices=["greedy", "beam"])
    p.add_argument("--beam_width", type=int, default=4)
    p.add_argument("--normalize", type=str, default=None,
                   choices=["none", "running", "fixed"])
    p.add_argument("--chunk_frames", type=int, default=None)
    p.add_argument("--batch_sessions", type=int, default=0,
                   help="continuous batching: serve up to N concurrent "
                        "sessions with one device program per tick "
                        "(greedy, beam, or beam + LM/hotword fusion)")
    p.add_argument("--shard_sessions", action="store_true",
                   help="shard --batch_sessions lanes across all local "
                        "devices (multi-chip serving; lanes must divide "
                        "evenly)")
    p.add_argument("--lm_path", type=str, default=None,
                   help="ARPA / kenlm-binary / pyctcdecode-dir LM for "
                        "shallow fusion (requires --decoder beam; composes "
                        "with --batch_sessions)")
    p.add_argument("--lm_weight", type=float, default=None)
    p.add_argument("--hotwords", type=str, nargs="*", default=None)
    p.add_argument("--hotword_weight", type=float, default=None)
    p.add_argument("--device_lm", type=str, default=None,
                   help="char-level n-gram LM fused ON DEVICE inside the "
                        "beam scan (requires --decoder beam; zero host work "
                        "per tick; mutually exclusive with --lm_path/"
                        "--hotwords)")
    p.add_argument("--device_lm_weight", type=float, default=0.3)
    p.add_argument("--device_lm_order", type=int, default=3,
                   help="cap the dense char-LM table order (V^order "
                        "entries)")
    p.add_argument("--use_ema", action="store_true",
                   help="serve the Polyak-averaged (EMA) shadow params "
                        "(requires train.ema_decay > 0 at training time)")
    p.add_argument("--average_k", type=int, default=None,
                   help="serve the element-wise mean of the best K retained "
                        "checkpoints (SWA-style averaging)")
    p.add_argument("--precision", choices=("fp32", "bf16"), default=None,
                   help="serving compute dtype: bf16 halves the weight "
                        "bytes every tick streams from HBM (beam scores "
                        "stay fp32); default keeps the checkpoint's dtype")
    p.add_argument("--drain_timeout", type=float, default=30.0,
                   help="on SIGTERM/SIGINT: stop accepting, then wait up to "
                        "this many seconds for in-flight sessions to finish "
                        "before exiting")
    args = p.parse_args()

    rec = Recognizer.from_checkpoint(args.checkpoint_dir,
                                     decoder=args.decoder,
                                     beam_width=args.beam_width,
                                     lm_path=args.lm_path,
                                     lm_weight=args.lm_weight,
                                     hotwords=args.hotwords,
                                     hotword_weight=args.hotword_weight,
                                     use_ema=args.use_ema,
                                     average_k=args.average_k,
                                     device_lm_path=args.device_lm,
                                     device_lm_weight=args.device_lm_weight,
                                     device_lm_order=args.device_lm_order,
                                     precision=args.precision)
    kw = {}
    if args.normalize:
        kw["normalize"] = args.normalize
    mesh = None
    if args.shard_sessions:
        from rnntransducer_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    server = StreamingServer(rec, host=args.host, port=args.port,
                             chunk_frames=args.chunk_frames,
                             batch_sessions=args.batch_sessions, mesh=mesh,
                             **kw)
    server.start()
    print(f"streaming on {args.host}:{server.port} "
          f"(decoder={args.decoder})", flush=True)

    # Graceful preemption: SIGTERM (the orchestrator's replace-me signal —
    # same contract the Trainer honors with its preemption checkpoint) and
    # SIGINT stop the accept loop, drain in-flight sessions so their clients
    # still receive finals, then exit 0.
    import signal

    stop_evt = threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: stop_evt.set())
    stop_evt.wait()
    clean = server.drain(timeout=args.drain_timeout)
    print("drained: all sessions finished" if clean
          else f"drain timeout ({args.drain_timeout}s): exiting with "
               "sessions in flight", flush=True)


if __name__ == "__main__":
    main()
