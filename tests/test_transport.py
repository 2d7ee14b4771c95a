"""Transport tests: pipes, TCP loopback, reconnect, newest-wins reads.

Covers what the reference left commented out (particle_io/src/lib.rs:55-93):
frame transfer over TCP including sequential reconnect of two clients.
"""

import io
import threading
import time

import numpy as np
import pytest

from particle_simulator_tpu.io.frame import Frame, PARTICLE_DTYPE
from particle_simulator_tpu.io.transport import (
    Disconnected,
    Reader,
    Writer,
    new_tcp_client,
    new_tcp_server,
)


def make_frame(n: int, tag: int = 0) -> Frame:
    f = Frame.new()
    parts = np.zeros(n, dtype=PARTICLE_DTYPE)
    parts["x"] = np.arange(n) + tag
    parts["ty"] = tag
    f.extend(parts)
    return f


def wait_for(cond, timeout=5.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        result = cond()
        if result is not None:
            return result
        time.sleep(0.002)
    raise TimeoutError()


def test_reader_over_byte_stream():
    frames = [make_frame(5), make_frame(21, tag=1), make_frame(2, tag=2)]
    raw = b"".join(f.bytes for f in frames)
    reader = Reader(io.BytesIO(raw))

    got = [wait_for(reader.read) for _ in range(3)]
    for sent, received in zip(frames, got):
        assert received == sent
    with pytest.raises(Disconnected):
        wait_for(reader.read)


def test_reader_skips_invalid_signature():
    # Like the reference (particle_io/src/reader.rs:34-37), a bad signature skips
    # one header-sized chunk and keeps reading — resync works when the corrupt
    # packet is header-only.
    good = make_frame(3)
    bad = bytearray(make_frame(0).bytes)
    bad[0] = 0x00  # corrupt start signature
    raw = bytes(bad) + good.bytes
    reader = Reader(io.BytesIO(raw))
    got = wait_for(reader.read)
    assert got == good


def test_read_last_newest_wins():
    frames = [make_frame(1, tag=i) for i in range(10)]
    raw = b"".join(f.bytes for f in frames)
    reader = Reader(io.BytesIO(raw))
    time.sleep(0.1)  # let the background thread enqueue everything
    got = reader.read_last()
    assert got == frames[-1]


def test_writer_bytes_equality():
    buf = io.BytesIO()
    w = Writer(buf)
    f = make_frame(7)
    assert w.write(f)
    assert buf.getvalue() == f.bytes


def test_tcp_roundtrip_and_reconnect():
    server = new_tcp_server(("127.0.0.1", 0))
    try:
        for attempt in range(2):  # two sequential clients = reconnect
            client_conn = {}

            def connect():
                client_conn["rw"] = new_tcp_client(server.addr)

            t = threading.Thread(target=connect)
            t.start()
            srv_rw = wait_for(server.try_accept)
            t.join()
            cli_reader, cli_writer = client_conn["rw"]
            srv_reader, srv_writer = srv_rw

            # client -> server
            f1 = make_frame(100, tag=attempt)
            assert cli_writer.write(f1)
            assert wait_for(srv_reader.read) == f1

            # server -> client
            f2 = make_frame(3, tag=attempt + 50)
            assert srv_writer.write(f2)
            assert wait_for(cli_reader.read) == f2

            cli_reader.close()
            srv_reader.close()
    finally:
        server.close()


def test_disconnect_detection():
    server = new_tcp_server(("127.0.0.1", 0))
    try:
        conn = {}
        t = threading.Thread(target=lambda: conn.update(rw=new_tcp_client(server.addr)))
        t.start()
        srv_reader, srv_writer = wait_for(server.try_accept)
        t.join()
        cli_reader, cli_writer = conn["rw"]

        cli_reader.close()  # closes the shared socket

        def poll():
            try:
                srv_reader.read()
                return None
            except Disconnected:
                return True

        assert wait_for(poll)
    finally:
        server.close()
