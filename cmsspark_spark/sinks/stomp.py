"""Minimal STOMP 1.2 wire transport for the AMQ push mile.

The reference ships monitoring documents to CERN MONIT through an AMQ
broker via the stomp.py client wrapped in StompAMQ (cern_monit.py:
37-63: wrap each row as a notification with a millisecond ``rec_tsmp``
and a hash id, then ``amq.send(arr)``). That client isn't in this
container, so the frames are implemented here directly from the public
STOMP 1.2 specification (https://stomp.github.io/stomp-specification-1.2
.html): ``COMMAND\\n`` + ``header:value\\n``* + ``\\n`` + body +
``\\x00``, with the 1.2 header-value escapes (``\\r`` ``\\n`` ``:``
``\\`` → ``\\r \\n \\c \\\\``).

Scale shape: a transport instance is ONE broker connection. Wired into
``push_documents(..., executor_side=True)`` the factory runs inside
``foreachPartition`` — one connection per partition, documents stream
out without ever collecting to the driver, and the optional RECEIPT
round-trip every ``receipt_every`` frames bounds unacked data in
flight (at-least-once, like the reference's blocking ``amq.send``).
"""

from __future__ import annotations

import json
import socket
import time
from typing import Iterable

_ESCAPES = [("\\", "\\\\"), ("\r", "\\r"), ("\n", "\\n"), (":", "\\c")]


def _escape(v: str) -> str:
    for raw, esc in _ESCAPES:
        v = v.replace(raw, esc)
    return v


def _unescape(v: str) -> str:
    out, i = [], 0
    while i < len(v):
        if v[i] == "\\" and i + 1 < len(v):
            nxt = v[i + 1]
            out.append({"\\": "\\", "r": "\r", "n": "\n", "c": ":"}.get(nxt, nxt))
            i += 2
        else:
            out.append(v[i])
            i += 1
    return "".join(out)


def build_frame(command: str, headers: dict[str, str], body: bytes = b"") -> bytes:
    """Serialize one STOMP 1.2 frame (spec §'STOMP Frames'). The
    CONNECT/CONNECTED frames are exempt from header escaping per spec;
    everything else escapes."""
    escape = command not in ("CONNECT", "CONNECTED")
    lines = [command]
    for k, v in headers.items():
        if escape:
            k, v = _escape(str(k)), _escape(str(v))
        lines.append(f"{k}:{v}")
    head = ("\n".join(lines) + "\n\n").encode("utf-8")
    return head + body + b"\x00"


def parse_frame(buf: bytes) -> tuple[str, dict[str, str], bytes]:
    """Parse one frame (without the trailing NUL). First-wins on
    repeated headers, per spec."""
    head, _, body = buf.partition(b"\n\n")
    lines = head.decode("utf-8").split("\n")
    command = lines[0]
    headers: dict[str, str] = {}
    escape = command not in ("CONNECT", "CONNECTED")
    for ln in lines[1:]:
        if not ln:
            continue
        k, _, v = ln.partition(":")
        if escape:
            k, v = _unescape(k), _unescape(v)
        headers.setdefault(k, v)
    return command, headers, body


def read_frame(sock: socket.socket, buf: bytearray) -> tuple[str, dict[str, str], bytes]:
    """Read one NUL-terminated frame from ``sock`` (leftover bytes stay
    in ``buf``). Skips heart-beat newlines between frames."""
    while True:
        while buf[:1] in (b"\n", b"\r"):
            del buf[0]
        nul = buf.find(b"\x00")
        if nul >= 0:
            frame = bytes(buf[:nul])
            del buf[: nul + 1]
            return parse_frame(frame)
        chunk = sock.recv(65536)
        if not chunk:
            raise ConnectionError("broker closed the connection")
        buf.extend(chunk)


class StompTransport:
    """One broker connection speaking STOMP 1.2.

    >>> t = StompTransport("broker", 61613, login="u", passcode="p")
    >>> t.connect()
    >>> t.send("/topic/cms", b'{"a": 1}')
    >>> t.disconnect()
    """

    def __init__(
        self,
        host: str,
        port: int,
        login: str | None = None,
        passcode: str | None = None,
        vhost: str | None = None,
        receipt_every: int = 0,
        timeout: float = 30.0,
    ):
        self.host, self.port = host, int(port)
        self.login, self.passcode = login, passcode
        self.vhost = vhost or host
        self.receipt_every = int(receipt_every)
        self.timeout = timeout
        self._sock: socket.socket | None = None
        self._buf = bytearray()
        self._sent = 0
        self._rid = 0

    def connect(self) -> dict[str, str]:
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout
        )
        headers = {"accept-version": "1.2", "host": self.vhost}
        if self.login is not None:
            headers["login"] = self.login
        if self.passcode is not None:
            headers["passcode"] = self.passcode
        self._sock.sendall(build_frame("CONNECT", headers))
        cmd, hdrs, _ = read_frame(self._sock, self._buf)
        if cmd == "ERROR":
            raise ConnectionError(f"broker refused CONNECT: {hdrs}")
        if cmd != "CONNECTED":
            raise ConnectionError(f"expected CONNECTED, got {cmd}")
        return hdrs

    def send(
        self, destination: str, body: bytes,
        content_type: str = "application/json",
        extra_headers: dict[str, str] | None = None,
    ) -> None:
        if self._sock is None:
            raise ConnectionError("not connected")
        headers = {
            "destination": destination,
            "content-type": content_type,
            "content-length": str(len(body)),
        }
        headers.update(extra_headers or {})
        self._sent += 1
        want_receipt = (
            self.receipt_every and self._sent % self.receipt_every == 0
        )
        if want_receipt:
            self._rid += 1
            headers["receipt"] = f"r{self._rid}"
        self._sock.sendall(build_frame("SEND", headers, body))
        if want_receipt:
            cmd, hdrs, _ = read_frame(self._sock, self._buf)
            if cmd != "RECEIPT" or hdrs.get("receipt-id") != f"r{self._rid}":
                raise ConnectionError(f"bad receipt: {cmd} {hdrs}")

    def disconnect(self) -> None:
        if self._sock is None:
            return
        try:
            self._rid += 1
            self._sock.sendall(
                build_frame("DISCONNECT", {"receipt": f"r{self._rid}"})
            )
            # graceful close waits for the final receipt (spec
            # 'Disconnecting') so all SENDs are known-processed
            cmd, hdrs, _ = read_frame(self._sock, self._buf)
        except (ConnectionError, OSError):
            pass
        finally:
            self._sock.close()
            self._sock = None


def make_notification(
    doc: dict, producer: str, doc_type: str = "metric",
    ts_ms: int | None = None,
) -> dict:
    """The MONIT notification envelope the reference wraps each row in
    (cern_monit.py:55-60: ``rec_tsmp`` in ms + a hash id into
    ``make_notification``): metadata block + the row as payload."""
    ts = int(time.time() * 1000) if ts_ms is None else int(ts_ms)
    return {
        "metadata": {
            "producer": producer,
            "type": doc_type,
            "timestamp": ts,
            "_id": str(doc.get("hash", doc.get("doc_id", ""))) or None,
        },
        "data": dict(doc),
    }


def amq_transport(
    host: str, port: int, destination: str, *,
    login: str | None = None, passcode: str | None = None,
    producer: str = "cms", doc_type: str = "metric",
    receipt_every: int = 100, ts_ms: int | None = None,
):
    """Factory returning a ``push_documents``-compatible transport:
    callable(list[dict]) that lazily opens ONE connection per calling
    worker, wraps each doc in the MONIT envelope, and SENDs it as a
    JSON frame. By-value closure — safe inside ``foreachPartition``."""
    state: dict = {}

    def _send(docs: Iterable[dict]) -> None:
        t = state.get("t")
        if t is None:
            t = StompTransport(
                host, port, login=login, passcode=passcode,
                receipt_every=receipt_every,
            )
            t.connect()
            state["t"] = t
        for doc in docs:
            body = json.dumps(
                make_notification(doc, producer, doc_type, ts_ms=ts_ms),
                sort_keys=True,
            ).encode("utf-8")
            t.send(destination, body)

    def _close() -> None:
        t = state.pop("t", None)
        if t is not None:
            t.disconnect()

    _send.close = _close  # type: ignore[attr-defined]
    return _send
