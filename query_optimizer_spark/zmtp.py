"""ZMTP 3.0 framing in pure Python -- the actual ZeroMQ wire protocol.

The reference talks to its agent over a libzmq PAIR socket
(ZeroMQServer.java:56-100).  libzmq is not installed in this container,
but ZMTP -- the bytes libzmq puts on the wire -- is a published public
specification (ZeroMQ RFC 23, https://rfc.zeromq.org/spec/23/), so this
module implements it directly over a TCP socket:

- 64-octet greeting: signature ``%xFF 8*%x00 %x7F``, version 3.0,
  mechanism ``NULL`` (20 octets, zero-padded), as-server ``%x00``
  (NULL mechanism), 31 filler octets;
- NULL-mechanism handshake: each peer sends a READY command carrying a
  ``Socket-Type`` metadata property; PAIR pairs only with PAIR;
- frames: flags octet (bit2=command, bit1=long, bit0=more) + size
  (1 octet short / 8-octet big-endian long) + body; every park payload
  is a single final message frame, exactly how the reference's Java
  binding sends strings.

A libzmq/pyzmq PAIR socket connecting to :class:`ZMTPStream` in server
mode completes this handshake and exchanges messages without either
side knowing the other is not libzmq -- that is the whole point of a
wire spec.  Constants below cite RFC 23 section names so the bytes can
be checked against the spec (tests/test_park_api.py pins the golden
greeting bytes).
"""

from __future__ import annotations

import socket
import struct

# greeting (RFC 23 "greeting" grammar)
SIGNATURE = b"\xff" + b"\x00" * 8 + b"\x7f"  # %xFF padding %x7F
VERSION = bytes([3, 0])                       # major 3, minor 0
MECHANISM = b"NULL" + b"\x00" * 16            # 20 octets, zero-padded
AS_SERVER = b"\x00"                           # NULL mechanism: always 0
FILLER = b"\x00" * 31
GREETING = SIGNATURE + VERSION + MECHANISM + AS_SERVER + FILLER
assert len(GREETING) == 64

# flags octet (RFC 23 "framing")
FLAG_MORE = 0x01
FLAG_LONG = 0x02
FLAG_COMMAND = 0x04

# park payloads are small JSON strings; any frame claiming to be larger
# than this is a garbled length field or a hostile peer -- reject before
# allocating rather than trusting an 8-byte length (up to 16 EiB)
MAX_FRAME_SIZE = 64 * 1024 * 1024


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed")
        buf += chunk
    return buf


def encode_frame(body: bytes, command: bool = False) -> bytes:
    flags = FLAG_COMMAND if command else 0
    if len(body) <= 255:
        return bytes([flags, len(body)]) + body
    return bytes([flags | FLAG_LONG]) + struct.pack(">Q", len(body)) + body


def encode_ready(socket_type: str) -> bytes:
    """READY command: name + Socket-Type metadata property (RFC 23
    "The NULL Security Mechanism")."""
    name = b"READY"
    prop_name = b"Socket-Type"
    prop_val = socket_type.encode()
    body = (
        bytes([len(name)])
        + name
        + bytes([len(prop_name)])
        + prop_name
        + struct.pack(">I", len(prop_val))
        + prop_val
    )
    return encode_frame(body, command=True)


def _parse_metadata(data: bytes) -> dict[str, bytes]:
    props: dict[str, bytes] = {}
    i = 0
    while i < len(data):
        nlen = data[i]
        i += 1
        pname = data[i : i + nlen].decode().lower()
        i += nlen
        (vlen,) = struct.unpack(">I", data[i : i + 4])
        i += 4
        props[pname] = data[i : i + vlen]
        i += vlen
    return props


class ZMTPStream:
    """One PAIR peer over an established TCP socket.  Construction
    performs the full greeting + NULL handshake; afterwards ``send`` /
    ``recv`` move single final message frames (UTF-8 strings, matching
    the reference's string-only protocol)."""

    def __init__(self, sock: socket.socket, socket_type: str = "PAIR"):
        self.sock = sock
        sock.sendall(GREETING)
        # read the signature octet alone first: a legacy length-prefixed
        # park client (framing="lp", the pre-r5 default) sends a 4-byte
        # length whose high byte is 0x00, so checking before demanding
        # the full 64-octet greeting turns a silent hang into an error
        first = _recv_exact(sock, 1)
        if first != b"\xff":
            raise ConnectionError(
                f"peer is not speaking ZMTP (first byte {first!r}); "
                "legacy length-prefixed park clients must pass "
                "framing='lp'"
            )
        peer = first + _recv_exact(sock, 63)
        if peer[9:10] != b"\x7f":
            raise ConnectionError("not a ZMTP peer (bad signature)")
        if peer[10] < 3:
            raise ConnectionError(f"ZMTP version {peer[10]} < 3 unsupported")
        mech = peer[12:32].rstrip(b"\x00")
        if mech != b"NULL":
            raise ConnectionError(f"unsupported mechanism {mech!r}")
        sock.sendall(encode_ready(socket_type))
        cmd_name, body = self._recv_frame(expect_command=True)
        if cmd_name != b"READY":
            raise ConnectionError(f"expected READY, got {cmd_name!r}")
        props = _parse_metadata(body)
        peer_type = props.get("socket-type", b"").decode()
        valid_peers = {
            "PAIR": {"PAIR"},
            "REQ": {"REP", "ROUTER"},
            "REP": {"REQ", "DEALER"},
        }.get(socket_type, set())
        if peer_type not in valid_peers:
            raise ConnectionError(
                f"{socket_type} cannot pair with socket type {peer_type!r}"
            )

    # --- framing ---------------------------------------------------------
    def _recv_frame(self, expect_command: bool = False):
        flags = _recv_exact(self.sock, 1)[0]
        if flags & FLAG_LONG:
            (size,) = struct.unpack(">Q", _recv_exact(self.sock, 8))
        else:
            size = _recv_exact(self.sock, 1)[0]
        if size > MAX_FRAME_SIZE:
            raise ConnectionError(
                f"frame size {size} exceeds cap {MAX_FRAME_SIZE}"
            )
        body = _recv_exact(self.sock, size)
        if flags & FLAG_COMMAND:
            nlen = body[0]
            name, rest = body[1 : 1 + nlen], body[1 + nlen :]
            if expect_command:
                return name, rest
            if name == b"PING":
                # ZMTP 3.1 heartbeat (RFC 37): PING body is a 2-octet
                # TTL followed by a context blob; the peer expects a
                # PONG echoing the context or it will drop the link
                context = rest[2:]
                pong = bytes([len(b"PONG")]) + b"PONG" + context
                self.sock.sendall(encode_frame(pong, command=True))
            # other commands (SUBSCRIBE etc.) are not used by the park
            # protocol; skip and read on
            return self._recv_frame(expect_command=False)
        if expect_command:
            raise ConnectionError("expected a command frame")
        if flags & FLAG_MORE:
            # park payloads are single-part; drain multipart defensively
            rest = self._recv_frame()
            return body + rest
        return body

    def send(self, payload: str) -> None:
        self.sock.sendall(encode_frame(payload.encode()))

    def recv(self) -> str:
        return self._recv_frame().decode()
