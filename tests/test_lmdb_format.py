"""LMDB on-disk-format invariants (VERDICT r2 Missing #2 / Next #4).

No canonical liblmdb exists in this environment (no pip ``lmdb``, no
system ``liblmdb.so``), so ``native/lmdb_lite.cc`` cannot be tested
against a file written by the real library.  These tests are the
strongest substitute: a SECOND, independent implementation of the format
— a pure-Python writer and parser in this file, built from the LMDB 0.9
layout (``mdb.c``: MDB_page / MDB_node / MDB_meta / MDB_db) — is
cross-checked against the native reader and writer in both directions:

  * hand-crafted Python-written files (incl. overflow values, two branch
    levels, non-4096 page size, torn/newer meta) must read correctly
    through ``LmdbEnv``;
  * files produced by ``write_lmdb`` must parse correctly with the
    Python parser, and carry the header fields stock liblmdb requires
    (magic, data version 1, ``mm_dbs[0].md_pad`` = page size — the field
    ``mdb_env_read_header`` takes the page size from).

A shared misunderstanding between two implementations written from the
same spec remains possible but requires the same mistake twice.
"""

import struct

import pytest

from tatt_tpu.data.lmdb_lite import LmdbEnv, write_lmdb

MAGIC = 0xBEEFC0DE
VERSION = 1
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
PAGEHDR = 16
NODEHDR = 8
INVALID = 2**64 - 1


# ----------------------------------------------------------------------
# Independent pure-Python implementation of the format (writer + parser)
# ----------------------------------------------------------------------


class PyPage:
    def __init__(self, pgno, flags, psize):
        self.pgno = pgno
        self.flags = flags
        self.psize = psize
        self.ptrs = []  # node offsets
        self.nodes = bytearray()  # grows; nodes packed from the top
        self.upper = psize

    def free(self):
        lower = PAGEHDR + 2 * len(self.ptrs)
        return self.upper - lower

    def add(self, node_bytes):
        need = len(node_bytes) + 2
        if self.free() < need:
            return False
        self.upper -= len(node_bytes)
        self.ptrs.append(self.upper)
        self.nodes[:0] = node_bytes  # prepend: nodes pack downward
        return True

    def render(self):
        buf = bytearray(self.psize)
        struct.pack_into(
            "<QHHHH",
            buf,
            0,
            self.pgno,
            0,
            self.flags,
            PAGEHDR + 2 * len(self.ptrs),  # pb_lower
            self.upper,  # pb_upper
        )
        for i, off in enumerate(self.ptrs):
            struct.pack_into("<H", buf, PAGEHDR + 2 * i, off)
        buf[self.upper : self.upper + len(self.nodes)] = self.nodes
        return bytes(buf)


def leaf_node(key, data, bigdata_pgno=None):
    dsize = len(data)
    flags = F_BIGDATA if bigdata_pgno is not None else 0
    body = key + (
        struct.pack("<Q", bigdata_pgno) if bigdata_pgno is not None else data
    )
    nd = (
        struct.pack("<HHHH", dsize & 0xFFFF, dsize >> 16, flags, len(key))
        + body
    )
    if len(nd) % 2:
        nd += b"\0"
    return nd


def branch_node(key, child_pgno):
    nd = (
        struct.pack(
            "<HHHH",
            child_pgno & 0xFFFF,
            (child_pgno >> 16) & 0xFFFF,
            (child_pgno >> 32) & 0xFFFF,
            len(key),
        )
        + key
    )
    if len(nd) % 2:
        nd += b"\0"
    return nd


def meta_page(pgno, psize, txnid, main_db, last_pg):
    buf = bytearray(psize)
    struct.pack_into("<QHH", buf, 0, pgno, 0, P_META)
    o = PAGEHDR
    struct.pack_into("<IIQQ", buf, o, MAGIC, VERSION, 0, max(last_pg + 1, 256) * psize)
    o += 24
    # mm_dbs[0] (FREE_DBI): md_pad carries the page size (mdb_env_read_header)
    struct.pack_into("<IHHQQQQQ", buf, o, psize, 0, 0, 0, 0, 0, 0, INVALID)
    o += 48
    struct.pack_into("<IHHQQQQQ", buf, o, *main_db)
    o += 48
    struct.pack_into("<QQ", buf, o, last_pg, txnid)
    return bytes(buf)


def py_write_lmdb(path, records, psize=4096, meta_variant="standard"):
    """Builds data.mdb with the pure-Python writer.  Returns page count."""
    items = sorted(records.items())
    nodemax = ((psize - PAGEHDR) // 2) & ~1
    pages = {}
    next_pg = [2]

    def alloc(flags, n=1):
        pg = next_pg[0]
        next_pg[0] += n
        page = PyPage(pg, flags, psize)
        pages[pg] = page
        return pg, page

    raw_pages = {}  # overflow continuation pages: pgno -> raw bytes

    # --- leaves
    level = []  # (first_key, pgno); first page gets b""
    cur = None
    n_leaf = n_ov = 0
    for key, val in items:
        big = None
        if NODEHDR + len(key) + len(val) > nodemax:
            npg = (len(val) + PAGEHDR + psize - 1) // psize
            ovpg = next_pg[0]
            next_pg[0] += npg
            first = bytearray(psize)
            struct.pack_into("<QHHI", first, 0, ovpg, 0, P_OVERFLOW, npg)
            chunk0 = val[: psize - PAGEHDR]
            first[PAGEHDR : PAGEHDR + len(chunk0)] = chunk0
            raw_pages[ovpg] = bytes(first)
            done = len(chunk0)
            for p in range(1, npg):
                chunk = val[done : done + psize]
                raw_pages[ovpg + p] = chunk + b"\0" * (psize - len(chunk))
                done += len(chunk)
            n_ov += npg
            big = ovpg
        nd = leaf_node(key, val, big)
        if cur is None:
            pg, cur = alloc(P_LEAF)
            n_leaf += 1
            level.append((b"" if len(level) == 0 else key, pg))
        if not cur.add(nd):
            pg, cur = alloc(P_LEAF)
            n_leaf += 1
            level.append((key, pg))
            assert cur.add(nd)

    # --- branches
    depth = 1
    n_branch = 0
    while len(level) > 1:
        up = []
        bp = None
        for i, (key, pgno) in enumerate(level):
            nd_key = key
            if bp is None:
                pg, bp = alloc(P_BRANCH)
                n_branch += 1
                up.append((key, pg))
                nd_key = b""
            if not bp.add(branch_node(nd_key, pgno)):
                pg, bp = alloc(P_BRANCH)
                n_branch += 1
                up.append((key, pg))
                assert bp.add(branch_node(b"", pgno))
        level = up
        depth += 1

    root = level[0][1] if items else INVALID
    last_pg = next_pg[0] - 1
    main_db = (0, 0, depth if items else 0, n_branch, n_leaf, n_ov, len(items), root)

    if meta_variant == "standard":
        metas = [
            meta_page(0, psize, 0, (0, 0, 0, 0, 0, 0, 0, INVALID), last_pg),
            meta_page(1, psize, 1, main_db, last_pg),
        ]
    elif meta_variant == "newer_meta0":
        # meta0 carries the LIVE tree at txnid 2; meta1 points at an empty
        # db with txnid 1 — readers must pick meta0
        metas = [
            meta_page(0, psize, 2, main_db, last_pg),
            meta_page(1, psize, 1, (0, 0, 0, 0, 0, 0, 0, INVALID), last_pg),
        ]
    elif meta_variant == "torn_meta":
        # newest meta (would-be txnid 2) has a corrupt magic: readers must
        # fall back to the older valid meta, which carries the tree
        good = meta_page(0, psize, 1, main_db, last_pg)
        torn = bytearray(meta_page(1, psize, 2, main_db, last_pg))
        struct.pack_into("<I", torn, PAGEHDR, 0xDEADBEEF)
        metas = [good, bytes(torn)]
    else:
        raise ValueError(meta_variant)

    with open(path, "wb") as fh:
        fh.write(metas[0])
        fh.write(metas[1])
        for pg in range(2, next_pg[0]):
            if pg in pages:
                fh.write(pages[pg].render())
            elif pg in raw_pages:
                fh.write(raw_pages[pg])
            else:
                raise AssertionError(f"hole at page {pg}")
    return next_pg[0]


def py_parse_lmdb(path):
    """Independent parser: returns (psize, depth, dict of all entries)."""
    with open(path, "rb") as fh:
        data = fh.read()

    def meta_at(off):
        magic, version, _addr, _msz = struct.unpack_from("<IIQQ", data, off + PAGEHDR)
        if magic != MAGIC or version != VERSION:
            return None
        free_db = struct.unpack_from("<IHHQQQQQ", data, off + PAGEHDR + 24)
        main_db = struct.unpack_from("<IHHQQQQQ", data, off + PAGEHDR + 72)
        txnid = struct.unpack_from("<QQ", data, off + PAGEHDR + 120)[1]
        return txnid, free_db, main_db

    m0 = meta_at(0)
    psize = m0[1][0] if m0 and m0[1][0] >= 512 else 4096
    metas = [m for m in (meta_at(0), meta_at(psize)) if m]
    assert metas, "no valid meta page"
    best = max(metas, key=lambda m: m[0])
    main = best[2]
    depth, entries_decl, root = main[2], main[6], main[7]

    out = {}

    def walk(pgno):
        off = pgno * psize
        _pg, _pad, flags, lower, upper = struct.unpack_from("<QHHHH", data, off)
        nkeys = (lower - PAGEHDR) >> 1
        ptrs = struct.unpack_from(f"<{nkeys}H", data, off + PAGEHDR)
        for p in ptrs:
            lo, hi, nflags, ksize = struct.unpack_from("<HHHH", data, off + p)
            key = data[off + p + NODEHDR : off + p + NODEHDR + ksize]
            if flags & P_BRANCH:
                walk(lo | (hi << 16) | (nflags << 32))
            elif flags & P_LEAF:
                dsize = lo | (hi << 16)
                if nflags & F_BIGDATA:
                    (ovpg,) = struct.unpack_from(
                        "<Q", data, off + p + NODEHDR + ksize
                    )
                    start = ovpg * psize + PAGEHDR
                    out[key] = data[start : start + dsize]
                else:
                    start = off + p + NODEHDR + ksize
                    out[key] = data[start : start + dsize]
            else:
                raise AssertionError(f"bad page flags {flags:#x} at {pgno}")

    if root != INVALID:
        walk(root)
    assert len(out) == entries_decl, (len(out), entries_decl)
    return psize, depth, out


# ----------------------------------------------------------------------
# fixtures
# ----------------------------------------------------------------------


def big_corpus():
    """>1000 keys, values spanning overflow pages, >=2 branch levels."""
    recs = {}
    for i in range(3000):
        # ~360B inline values -> ~10 per leaf -> ~300 leaves -> >1 branch
        # page (~170 children each) -> depth 3
        recs[b"key-%09d" % i] = (b"v%05d" % i) * 72
    for i in range(8):
        recs[b"big-%03d" % i] = bytes((i + j) % 251 for j in range(9000))
    recs[b"num-samples"] = b"3000"
    return recs


# ----------------------------------------------------------------------
# Python-written files -> native reader
# ----------------------------------------------------------------------


def test_native_reader_parses_python_written_file(tmp_path):
    recs = big_corpus()
    path = tmp_path / "data.mdb"
    py_write_lmdb(str(path), recs)
    # structure sanity: the fixture really exercises 2 branch levels
    _, depth, parsed = py_parse_lmdb(str(path))
    assert depth >= 3 and parsed == recs

    env = LmdbEnv(str(tmp_path))
    assert env.entries() == len(recs)
    for k, v in recs.items():
        assert env.get(k) == v, k
    assert env.get(b"absent") is None
    assert env.get(b"key-") is None  # prefix of real keys
    env.close()


def test_native_reader_picks_newer_meta0(tmp_path):
    path = tmp_path / "data.mdb"
    py_write_lmdb(str(path), {b"a": b"1", b"b": b"2"}, meta_variant="newer_meta0")
    env = LmdbEnv(str(tmp_path))
    assert env.entries() == 2
    assert env.get(b"a") == b"1"
    env.close()


def test_native_reader_survives_torn_newest_meta(tmp_path):
    path = tmp_path / "data.mdb"
    py_write_lmdb(str(path), {b"a": b"1"}, meta_variant="torn_meta")
    env = LmdbEnv(str(tmp_path))
    assert env.get(b"a") == b"1"
    env.close()


def test_native_reader_honors_md_pad_page_size(tmp_path):
    """liblmdb stores the writing system's page size in mm_dbs[0].md_pad;
    archives from 8K/16K-page hosts must parse."""
    recs = {b"k%04d" % i: b"value-%04d" % i for i in range(600)}
    for ps in (8192, 16384):
        path = tmp_path / f"ps{ps}" / "data.mdb"
        path.parent.mkdir()
        py_write_lmdb(str(path), recs, psize=ps)
        env = LmdbEnv(str(path.parent))
        assert env.entries() == len(recs)
        for k in (b"k0000", b"k0299", b"k0599"):
            assert env.get(k) == recs[k]
        env.close()


def test_native_reader_rejects_corrupt_leaf(tmp_path):
    recs = {b"k%03d" % i: b"v" * 64 for i in range(200)}
    path = tmp_path / "data.mdb"
    py_write_lmdb(str(path), recs)
    raw = bytearray(path.read_bytes())
    # find the root's first leaf page and zero its flags
    for off in range(2 * 4096, len(raw), 4096):
        flags = struct.unpack_from("<H", raw, off + 10)[0]
        if flags == P_LEAF:
            struct.pack_into("<H", raw, off + 10, 0)
            break
    path.write_bytes(bytes(raw))
    env = LmdbEnv(str(tmp_path))
    with pytest.raises(IOError, match="corruption"):
        # walk until the corrupted page is hit
        for k in sorted(recs):
            env.get(k)
    env.close()


def test_native_reader_rejects_garbage(tmp_path):
    path = tmp_path / "data.mdb"
    path.write_bytes(b"\x00" * 16384)
    with pytest.raises(IOError, match="not a valid LMDB file"):
        LmdbEnv(str(tmp_path))


# ----------------------------------------------------------------------
# native writer -> Python parser
# ----------------------------------------------------------------------


def test_python_parser_reads_native_writer(tmp_path):
    recs = big_corpus()
    write_lmdb(str(tmp_path), recs)
    psize, depth, parsed = py_parse_lmdb(str(tmp_path / "data.mdb"))
    assert psize == 4096  # md_pad present: stock liblmdb needs it
    assert depth >= 3  # two branch levels actually exercised
    assert parsed == recs


def test_cross_roundtrip_python_vs_native_writer_bytes_compatible(tmp_path):
    """Both writers' files must be mutually readable (not byte-identical
    — page packing may differ — but semantically identical)."""
    recs = {b"n%05d" % i: b"payload-%05d" % i for i in range(300)}
    recs[b"blob"] = bytes(range(256)) * 40  # overflow value
    write_lmdb(str(tmp_path / "native"), recs)
    (tmp_path / "python").mkdir()
    py_write_lmdb(str(tmp_path / "python" / "data.mdb"), recs)

    native_via_py = py_parse_lmdb(str(tmp_path / "native" / "data.mdb"))[2]
    env = LmdbEnv(str(tmp_path / "python"))
    python_via_native = {k: env.get(k) for k in recs}
    env.close()
    assert native_via_py == recs
    assert python_via_native == recs
