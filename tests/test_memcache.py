# -*- coding: utf-8 -*-
"""Memcached byte-cache: protocol client vs an in-process fake server,
IO integration (populate-on-miss, serve-from-cache, disk fallback).

Mirrors the reference's mc_client read path (reference: utils/io.py:58-101)
without its cluster dependency.
"""

import os
import pickle
import socketserver
import threading

import numpy as np
import pytest

from gaussiancity_tpu.data import memcache
from gaussiancity_tpu.data.io import IO
from gaussiancity_tpu.data.memcache import MemcachedClient


class _FakeMemcachedHandler(socketserver.StreamRequestHandler):
    """Stock memcached ASCII get/set subset, with a configurable item cap."""

    def handle(self):
        store = self.server.store
        while True:
            line = self.rfile.readline()
            if not line:
                return
            parts = line.strip().split()
            if not parts:
                continue
            cmd = parts[0]
            if cmd == b"get":
                for key in parts[1:]:
                    val = store.get(key)
                    if val is not None:
                        self.wfile.write(
                            b"VALUE %s 0 %d\r\n%s\r\n" % (key, len(val), val))
                self.wfile.write(b"END\r\n")
            elif cmd == b"set":
                key, nbytes = parts[1], int(parts[4])
                data = self.rfile.read(nbytes)
                self.rfile.read(2)  # \r\n
                if nbytes > self.server.max_item:
                    self.wfile.write(b"SERVER_ERROR object too large\r\n")
                else:
                    store[key] = data
                    self.wfile.write(b"STORED\r\n")
            else:
                self.wfile.write(b"ERROR\r\n")


@pytest.fixture()
def fake_server():
    srv = socketserver.ThreadingTCPServer(
        ("127.0.0.1", 0), _FakeMemcachedHandler)
    # handler threads sit in readline() on the client's pooled
    # connections — don't let server_close() join them
    srv.daemon_threads = True
    srv.block_on_close = False
    srv.store = {}
    srv.max_item = 1024 * 1024
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _client(srv, **kw):
    return MemcachedClient([f"127.0.0.1:{srv.server_address[1]}"], **kw)


class TestProtocol:
    def test_set_get_roundtrip(self, fake_server):
        c = _client(fake_server)
        blob = os.urandom(1000)
        assert c.set_file("/some/path.pkl", blob)
        assert c.get_file("/some/path.pkl") == blob
        assert c.get_file("/other/path.pkl") is None

    def test_empty_value(self, fake_server):
        c = _client(fake_server)
        assert c.set_file("/empty", b"")
        assert c.get_file("/empty") == b""

    def test_chunked_large_value(self, fake_server, monkeypatch):
        monkeypatch.setattr(memcache, "_CHUNK", 1024)
        c = _client(fake_server)
        blob = os.urandom(10 * 1024 + 17)  # 11 chunks
        assert c.set_file("/big.npy", blob)
        assert c.get_file("/big.npy") == blob
        base = MemcachedClient._key("/big.npy")
        expect = {base.encode()} | {
            f"{base}:{i}".encode() for i in range(11)}
        assert set(fake_server.store) == expect

    def test_partial_eviction_is_a_miss(self, fake_server, monkeypatch):
        monkeypatch.setattr(memcache, "_CHUNK", 1024)
        c = _client(fake_server)
        blob = os.urandom(3000)
        assert c.set_file("/evict.npy", blob)
        victim = next(k for k in fake_server.store if k.endswith(b":1"))
        del fake_server.store[victim]
        assert c.get_file("/evict.npy") is None

    def test_server_down_returns_none(self):
        c = MemcachedClient(["127.0.0.1:1"], timeout=0.2)
        assert c.get_file("/x") is None
        assert not c.set_file("/x", b"data")


class TestIOIntegration:
    @pytest.fixture(autouse=True)
    def _clean_cache(self):
        yield
        IO.configure_cache(None)

    def test_populate_on_miss_then_serve_from_cache(self, fake_server,
                                                    tmp_path):
        IO.configure_cache(_client(fake_server))
        arr = np.arange(24, dtype=np.float32).reshape(4, 6)
        p = str(tmp_path / "a.npy")
        np.save(p, arr)
        np.testing.assert_array_equal(IO.get(p), arr)  # miss -> disk -> set
        os.remove(p)
        np.testing.assert_array_equal(IO.get(p), arr)  # served from cache

    def test_pkl_and_img_through_cache(self, fake_server, tmp_path):
        from PIL import Image

        IO.configure_cache(_client(fake_server))
        obj = {"pts": np.ones((3, 2), np.int16), "n": 7}
        pp = str(tmp_path / "b.pkl")
        with open(pp, "wb") as f:
            pickle.dump(obj, f)
        got = IO.get(pp)
        assert got["n"] == 7
        np.testing.assert_array_equal(got["pts"], obj["pts"])

        ip = str(tmp_path / "c.png")
        Image.fromarray(
            np.arange(64, dtype=np.uint8).reshape(8, 8)).save(ip)
        first = np.array(IO.get(ip))
        os.remove(ip)
        os.remove(pp)
        np.testing.assert_array_equal(np.array(IO.get(ip)), first)
        assert IO.get(pp)["n"] == 7

    def test_cache_error_falls_back_to_disk(self, tmp_path):
        IO.configure_cache(MemcachedClient(["127.0.0.1:1"], timeout=0.2))
        arr = np.zeros((2, 2))
        p = str(tmp_path / "d.npy")
        np.save(p, arr)
        np.testing.assert_array_equal(IO.get(p), arr)

    def test_get_dataset_configures_cache(self, fake_server, tmp_path):
        from gaussiancity_tpu.config import Config, MemcachedConfig

        cfg = Config(memcached=MemcachedConfig(
            enabled=True,
            servers=(f"127.0.0.1:{fake_server.server_address[1]}",)))
        cfg = cfg.replace(dataset=cfg.dataset.replace(dir=str(tmp_path)))
        from gaussiancity_tpu.data.datasets import get_dataset

        try:
            get_dataset(cfg, "GOOGLE_EARTH", "train")
        except (FileNotFoundError, ValueError, OSError):
            pass  # empty dataset dir is fine — we only test the hook
        assert IO._cache is not None
