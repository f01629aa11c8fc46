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

Documented difference: libzmq is not in this container, so frames ride
a length-prefixed TCP stream (4-byte big-endian length + UTF-8 body)
instead of ZMQ's own framing.  One frame == one ZMQ message; nothing
else changes.
"""

from __future__ import annotations

import json
import socket
import struct
import threading

from .park_api import ParkSession


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


class ParkServer:
    """Serves one ParkSession to one client (PAIR = exactly two peers)."""

    def __init__(self, session: ParkSession, host: str = "127.0.0.1", port: int = 0):
        self.session = session
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
                while True:
                    try:
                        cmd = _recv(conn)
                    except ConnectionError:
                        return
                    if not self._dispatch(conn, cmd):
                        return
        finally:
            self._listener.close()

    def _dispatch(self, conn: socket.socket, cmd: str) -> bool:
        s = self.session
        if cmd == "reset":
            s.reset()
            _send(conn, "")
        elif cmd == "getActions":
            _send(conn, json.dumps(s.getActions()))
        elif cmd == "step":
            _send(conn, "")  # ack, then the action index arrives
            action = int(_recv(conn))
            s.step(action)
            _send(conn, "")
        elif cmd == "getReward":
            _send(conn, str(s.getReward()))
        elif cmd == "getTrueReward":
            _send(conn, str(s.getTrueReward()))
        elif cmd == "isDone":
            # the reference exposes episodeDone as an int
            _send(conn, str(int(s.isDone())))
        elif cmd == "getQueryGraph":
            # "First send the vertexes, then the edges" with a client ack
            # between the payloads (ZeroMQServer.java:173-180)
            state = s.getQueryGraph()
            _send(conn, json.dumps(state["vertices"]))
            _recv(conn)
            _send(conn, json.dumps(state["edges"]))
        elif cmd == "setCardinalities":
            _send(conn, "")
            s.setCardinalities(_recv(conn))
            _send(conn, "")
        elif cmd == "setQueries":
            _send(conn, "")
            mode = _recv(conn)
            _send(conn, "")
            s.setQueries(mode, _recv(conn))
            _send(conn, "")
        elif cmd == "getJoinsCost":
            _send(conn, "0.0")  # ref acks with a dummy 0.00 (:191-193)
            planner = _recv(conn)
            costs = s.getJoinsCost(planner)
            _send(conn, str(sum(costs.values()) if costs else 0.0))
        elif cmd == "getOptPlan":
            _send(conn, "")
            _recv(conn)  # planner name (the ref reads and ignores it too)
            _send(conn, s.getOptPlan())
        elif cmd == "curQuery":
            _send(conn, s.curQuery())
        elif cmd == "getCurrentQueryName":
            _send(conn, s.getCurrentQueryName())
        elif cmd == "getCurQuerySet":
            _send(conn, s.getCurQuerySet())
        elif cmd == "getAttrCount":
            _send(conn, str(s.getAttrCount()))
        elif cmd == "getQueryInfo":
            _send(conn, s.getQueryInfo())
        elif cmd == "joinOrderSeq":
            _send(conn, s.joinOrderSeq())
        elif cmd == "train":
            s.train()
            _send(conn, "")
        elif cmd == "test":
            s.test()
            _send(conn, "")
        elif cmd == "execOnDB":
            s.execOnDB()
            _send(conn, "")
        elif cmd == "noExecOnDB":
            s.noExecOnDB()
            _send(conn, "")
        elif cmd == "getEstCardinalityCosts":
            _send(conn, json.dumps(s.getEstCardinalityCosts()))
        elif cmd == "getOptCardinalityCosts":
            _send(conn, json.dumps(s.getOptCardinalityCosts()))
        elif cmd == "END":
            s.END()
            _send(conn, "")
            return False
        else:
            _send(conn, cmd)  # DEFAULT branch echoes (ZeroMQServer:251-253)
        return True


class ParkClient:
    """Python client speaking the wire protocol -- the shape an agent
    ported from the reference's Python side would use."""

    def __init__(self, host: str, port: int):
        self.sock = socket.create_connection((host, port))

    def _cmd(self, name: str) -> str:
        _send(self.sock, name)
        return _recv(self.sock)

    def reset(self) -> None:
        self._cmd("reset")

    def getActions(self) -> list[int]:
        return json.loads(self._cmd("getActions"))

    def step(self, action: int) -> None:
        _send(self.sock, "step")
        _recv(self.sock)  # ack
        _send(self.sock, str(action))
        _recv(self.sock)

    def getReward(self) -> float:
        return float(self._cmd("getReward"))

    def getTrueReward(self) -> float:
        return float(self._cmd("getTrueReward"))

    def isDone(self) -> bool:
        return bool(int(self._cmd("isDone")))

    def getQueryGraph(self) -> tuple[object, object]:
        _send(self.sock, "getQueryGraph")
        vertices = json.loads(_recv(self.sock))
        _send(self.sock, "")  # ack between the two payloads
        edges = json.loads(_recv(self.sock))
        return vertices, edges

    def setQueries(self, mode: str, queries: dict[str, str]) -> None:
        _send(self.sock, "setQueries")
        _recv(self.sock)
        _send(self.sock, mode)
        _recv(self.sock)
        _send(self.sock, json.dumps(queries))
        _recv(self.sock)

    def setCardinalities(self, cards: dict[str, float]) -> None:
        _send(self.sock, "setCardinalities")
        _recv(self.sock)
        _send(self.sock, json.dumps(cards))
        _recv(self.sock)

    def getJoinsCost(self, planner: str) -> float:
        _send(self.sock, "getJoinsCost")
        _recv(self.sock)  # dummy ack
        _send(self.sock, planner)
        return float(_recv(self.sock))

    def curQuery(self) -> str:
        return self._cmd("curQuery")

    def getCurrentQueryName(self) -> str:
        return self._cmd("getCurrentQueryName")

    def joinOrderSeq(self) -> str:
        return self._cmd("joinOrderSeq")

    def getOptPlan(self, planner: str = "dp_ccp") -> str:
        _send(self.sock, "getOptPlan")
        _recv(self.sock)
        _send(self.sock, planner)
        return _recv(self.sock)

    def test(self) -> None:
        self._cmd("test")

    def train(self) -> None:
        self._cmd("train")

    def end(self) -> None:
        self._cmd("END")
        self.sock.close()
