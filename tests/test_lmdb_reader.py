"""Pure-Python LMDB reader tests: the reference's real fixture plus a
hand-crafted two-level B+tree (branch traversal)."""

import os
import struct

import numpy as np
import pytest

from fcvsr_tpu.data.lmdb_reader import LmdbReader, SRLmdbDataset

FIXTURE = "/root/reference/mmedit_train/tests/data/lq.lmdb"


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture not present")
def test_reads_reference_fixture():
    r = LmdbReader(FIXTURE)
    assert r.entries == 1
    assert list(r.keys()) == [b"baboon"]
    blob = r.get(b"baboon")
    assert blob[:4] == b"\x89PNG"
    assert r.get(b"missing") is None

    ds = SRLmdbDataset(FIXTURE)
    img = ds.load("baboon")
    assert img.shape == (120, 125, 3)


def _write_page(buf, pgno, flags, nodes, branch=False):
    """Assemble one LMDB page with the given (key, value|child_pgno) nodes."""
    off = pgno * 4096
    ptrs = []
    upper = 4096
    payload = {}
    for key, val in nodes:
        if branch:
            child = val
            node = struct.pack("<HHHH", child & 0xFFFF, (child >> 16) & 0xFFFF,
                               (child >> 32) & 0xFFFF, len(key)) + key
        else:
            node = struct.pack("<HHHH", len(val) & 0xFFFF, len(val) >> 16, 0,
                               len(key)) + key + val
        if len(node) % 2:
            node += b"\x00"
        upper -= len(node)
        payload[upper] = node
        ptrs.append(upper)
    lower = 16 + 2 * len(ptrs)
    header = struct.pack("<QHHHH", pgno, 0, flags, lower, upper)
    buf[off : off + 16] = header
    buf[off + 16 : off + 16 + 2 * len(ptrs)] = struct.pack(
        f"<{len(ptrs)}H", *ptrs)
    for p, node in payload.items():
        buf[off + p : off + p + len(node)] = node


def test_branch_traversal_synthetic(tmp_path):
    """meta -> branch root -> two leaves; keys split across leaves."""
    buf = bytearray(4096 * 6)
    # meta pages
    for pg, txnid, root in ((0, 0, 0xFFFFFFFFFFFFFFFF), (1, 1, 2)):
        off = pg * 4096
        buf[off : off + 16] = struct.pack("<QHHHH", pg, 0, 0x08, 0, 0)
        meta = struct.pack("<II", 0xBEEFC0DE, 1)
        meta += struct.pack("<QQ", 0, 4096 * 6)
        free_db = struct.pack("<IHHQQQQQ", 0, 0, 0, 0, 0, 0, 0,
                              0xFFFFFFFFFFFFFFFF)
        main_db = struct.pack("<IHHQQQQQ", 0, 0, 2, 1, 2, 0, 4, root)
        meta += free_db + main_db + struct.pack("<QQ", 5, txnid)
        buf[off + 16 : off + 16 + len(meta)] = meta
    # leaves: page 3 (keys a,b), page 4 (keys m,z)
    _write_page(buf, 3, 0x02, [(b"a", b"va"), (b"b", b"vb")])
    _write_page(buf, 4, 0x02, [(b"m", b"vm"), (b"z", b"vz")])
    # branch root page 2: first child implicit-low key b"", second keyed b"m"
    _write_page(buf, 2, 0x01, [(b"", 3), (b"m", 4)], branch=True)

    path = tmp_path / "synth.mdb"
    path.write_bytes(bytes(buf))
    r = LmdbReader(str(path))
    assert r.get(b"a") == b"va"
    assert r.get(b"b") == b"vb"
    assert r.get(b"m") == b"vm"
    assert r.get(b"z") == b"vz"
    assert r.get(b"q") is None
    assert sorted(r.keys()) == [b"a", b"b", b"m", b"z"]
