"""Wire-level front-end for :class:`ParkSession` -- the reference's
ZeroMQ PAIR protocol (ZeroMQServer.java:56-100) over a loopback TCP
socket, so an agent written against the reference's message flows ports
by changing only the transport constructor.

Protocol fidelity (ZeroMQServer.waitForCommand :101-266):

- single-threaded strict request->response alternation (PAIR semantics);
- every payload is a STRING, exactly as the reference notes ("the only
  thing supported by the ZeroMQ protocol");
- the same two-phase command flows: ``setCardinalities`` (ack -> JSON),
  ``setQueries`` (ack -> mode -> ack -> JSON), ``step`` (ack -> action
  index), ``getJoinsCost`` (ack=0.00 -> planner name), ``getOptPlan``
  (ack -> planner name), ``getQueryGraph`` (vertices -> client ack ->
  edges);
- unknown commands echo back (the reference's DEFAULT branch returns
  the message).

Transports (``framing=``):

- ``"zmtp"`` (default): actual ZMTP 3.0 wire framing per the public
  ZeroMQ RFC 23 spec -- 64-octet greeting, NULL-mechanism READY
  handshake with PAIR socket-type checking, short/long message frames
  (``zmtp.py``; libzmq itself is not in this container, but the BYTES
  match what a libzmq PAIR socket sends, so a pyzmq agent pointed at
  this port completes the handshake unmodified).
- ``"lp"``: the r2 legacy framing -- 4-byte big-endian length + UTF-8
  body per message.

One frame == one ZMQ message; the command flows are identical in both.
"""

from __future__ import annotations

import json
import socket
import struct
import threading

from .park_api import ParkSession
from .zmtp import ZMTPStream


def _send(sock: socket.socket, payload: str) -> None:
    data = payload.encode()
    sock.sendall(struct.pack(">I", len(data)) + data)


def _recv(sock: socket.socket) -> str:
    hdr = b""
    while len(hdr) < 4:
        chunk = sock.recv(4 - len(hdr))
        if not chunk:
            raise ConnectionError("peer closed")
        hdr += chunk
    (n,) = struct.unpack(">I", hdr)
    body = b""
    while len(body) < n:
        chunk = sock.recv(n - len(body))
        if not chunk:
            raise ConnectionError("peer closed mid-frame")
        body += chunk
    return body.decode()


class _LPStream:
    """Legacy length-prefixed framing as a stream object."""

    def __init__(self, sock: socket.socket):
        self.sock = sock

    def send(self, payload: str) -> None:
        _send(self.sock, payload)

    def recv(self) -> str:
        return _recv(self.sock)


def _make_stream(sock: socket.socket, framing: str):
    if framing == "zmtp":
        return ZMTPStream(sock)
    if framing == "lp":
        return _LPStream(sock)
    raise ValueError(f"unknown framing {framing!r}")


class ParkServer:
    """Serves one ParkSession to one client (PAIR = exactly two peers)."""

    def __init__(
        self,
        session: ParkSession,
        host: str = "127.0.0.1",
        port: int = 0,
        framing: str = "zmtp",
    ):
        self.session = session
        self.framing = framing
        self._listener = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._listener.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._listener.bind((host, port))
        self._listener.listen(1)
        self.host, self.port = self._listener.getsockname()
        self._thread: threading.Thread | None = None

    def serve_in_background(self) -> "ParkServer":
        self._thread = threading.Thread(target=self.serve_forever, daemon=True)
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        conn, _ = self._listener.accept()
        try:
            with conn:
                stream = _make_stream(conn, self.framing)
                while True:
                    try:
                        cmd = stream.recv()
                    except ConnectionError:
                        return
                    if not self._dispatch(stream, cmd):
                        return
        finally:
            self._listener.close()

    def _dispatch(self, conn, cmd: str) -> bool:
        s = self.session
        if cmd == "reset":
            s.reset()
            conn.send("")
        elif cmd == "getActions":
            conn.send(json.dumps(s.getActions()))
        elif cmd == "step":
            conn.send("")  # ack, then the action index arrives
            action = int(conn.recv())
            s.step(action)
            conn.send("")
        elif cmd == "getReward":
            conn.send(str(s.getReward()))
        elif cmd == "getTrueReward":
            conn.send(str(s.getTrueReward()))
        elif cmd == "isDone":
            # the reference exposes episodeDone as an int
            conn.send(str(int(s.isDone())))
        elif cmd == "getQueryGraph":
            # "First send the vertexes, then the edges" with a client ack
            # between the payloads (ZeroMQServer.java:173-180)
            state = s.getQueryGraph()
            conn.send(json.dumps(state["vertices"]))
            conn.recv()
            conn.send(json.dumps(state["edges"]))
        elif cmd == "setCardinalities":
            conn.send("")
            s.setCardinalities(conn.recv())
            conn.send("")
        elif cmd == "setQueries":
            conn.send("")
            mode = conn.recv()
            conn.send("")
            s.setQueries(mode, conn.recv())
            conn.send("")
        elif cmd == "getJoinsCost":
            conn.send("0.0")  # ref acks with a dummy 0.00 (:191-193)
            planner = conn.recv()
            costs = s.getJoinsCost(planner)
            conn.send(str(sum(costs.values()) if costs else 0.0))
        elif cmd == "getOptPlan":
            conn.send("")
            conn.recv()  # planner name (the ref reads and ignores it too)
            conn.send(s.getOptPlan())
        elif cmd == "curQuery":
            conn.send(s.curQuery())
        elif cmd == "getCurrentQueryName":
            conn.send(s.getCurrentQueryName())
        elif cmd == "getCurQuerySet":
            conn.send(s.getCurQuerySet())
        elif cmd == "getAttrCount":
            conn.send(str(s.getAttrCount()))
        elif cmd == "getQueryInfo":
            conn.send(s.getQueryInfo())
        elif cmd == "joinOrderSeq":
            conn.send(s.joinOrderSeq())
        elif cmd == "train":
            s.train()
            conn.send("")
        elif cmd == "test":
            s.test()
            conn.send("")
        elif cmd == "execOnDB":
            s.execOnDB()
            conn.send("")
        elif cmd == "noExecOnDB":
            s.noExecOnDB()
            conn.send("")
        elif cmd == "getEstCardinalityCosts":
            conn.send(json.dumps(s.getEstCardinalityCosts()))
        elif cmd == "getOptCardinalityCosts":
            conn.send(json.dumps(s.getOptCardinalityCosts()))
        elif cmd == "END":
            s.END()
            conn.send("")
            return False
        else:
            conn.send(cmd)  # DEFAULT branch echoes (ZeroMQServer:251-253)
        return True


class ParkClient:
    """Python client speaking the wire protocol -- the shape an agent
    ported from the reference's Python side would use."""

    def __init__(self, host: str, port: int, framing: str = "zmtp"):
        self.sock = socket.create_connection((host, port))
        self.stream = _make_stream(self.sock, framing)

    def _cmd(self, name: str) -> str:
        self.stream.send(name)
        return self.stream.recv()

    def reset(self) -> None:
        self._cmd("reset")

    def getActions(self) -> list[int]:
        return json.loads(self._cmd("getActions"))

    def step(self, action: int) -> None:
        self.stream.send("step")
        self.stream.recv()  # ack
        self.stream.send(str(action))
        self.stream.recv()

    def getReward(self) -> float:
        return float(self._cmd("getReward"))

    def getTrueReward(self) -> float:
        return float(self._cmd("getTrueReward"))

    def isDone(self) -> bool:
        return bool(int(self._cmd("isDone")))

    def getQueryGraph(self) -> tuple[object, object]:
        self.stream.send("getQueryGraph")
        vertices = json.loads(self.stream.recv())
        self.stream.send("")  # ack between the two payloads
        edges = json.loads(self.stream.recv())
        return vertices, edges

    def setQueries(self, mode: str, queries: dict[str, str]) -> None:
        self.stream.send("setQueries")
        self.stream.recv()
        self.stream.send(mode)
        self.stream.recv()
        self.stream.send(json.dumps(queries))
        self.stream.recv()

    def setCardinalities(self, cards: dict[str, float]) -> None:
        self.stream.send("setCardinalities")
        self.stream.recv()
        self.stream.send(json.dumps(cards))
        self.stream.recv()

    def getJoinsCost(self, planner: str) -> float:
        self.stream.send("getJoinsCost")
        self.stream.recv()  # dummy ack
        self.stream.send(planner)
        return float(self.stream.recv())

    def curQuery(self) -> str:
        return self._cmd("curQuery")

    def getCurrentQueryName(self) -> str:
        return self._cmd("getCurrentQueryName")

    def joinOrderSeq(self) -> str:
        return self._cmd("joinOrderSeq")

    def getOptPlan(self, planner: str = "dp_ccp") -> str:
        self.stream.send("getOptPlan")
        self.stream.recv()
        self.stream.send(planner)
        return self.stream.recv()

    def test(self) -> None:
        self._cmd("test")

    def train(self) -> None:
        self._cmd("train")

    def end(self) -> None:
        self._cmd("END")
        self.sock.close()
