"""Pure-Python MaxMind DB (.mmdb) reader — the file format behind the
reference's geoip enrichment table (src/enrichment_tables/geoip.rs,
which uses the maxminddb crate; the format itself is a public spec:
https://maxmind.github.io/MaxMind-DB/).

Spark-first integration: rather than per-row point lookups (a Python
UDF calling a C extension in the reference's world), the reader
ENUMERATES the search tree into a `(cidr, data...)` dimension table —
:func:`mmdb_dim` — which feeds the existing broadcast range join
(`operators.enrich.enrich_cidr`). GeoIP block tables are a few million
disjoint networks: broadcast-sized, and the probe side stays in
codegen with zero Python per fact row. `lookup` does driver-side point
queries for tests/debugging.

Supports: record sizes 24/28/32, IPv4 and IPv6 trees (IPv4 networks in
an ip_version=6 tree are surfaced from the ::ffff:0:0/96 and
::0/96-aligned subtrees as plain dotted quads), all data-section types
of the spec (pointer, utf8, double, bytes, uint16/32/64/128, int32,
map, array, bool, float).
"""

from __future__ import annotations

import struct
from typing import Any, Iterator

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR = 16  # bytes of zeros between tree and data section


class MMDBError(ValueError):
    pass


def _decode(buf: bytes, pos: int, data_base: int) -> tuple[Any, int]:
    """Decode one value at absolute offset `pos`. Pointers are
    relative to `data_base` (the data section start)."""
    ctrl = buf[pos]
    pos += 1
    dtype = ctrl >> 5
    size = ctrl & 0x1F

    if dtype == 1:  # pointer
        ss = (size >> 3) & 0x3
        v = size & 0x7
        if ss == 0:
            ptr = (v << 8) | buf[pos]
            pos += 1
        elif ss == 1:
            ptr = ((v << 16) | (buf[pos] << 8) | buf[pos + 1]) + 2048
            pos += 2
        elif ss == 2:
            ptr = (
                (v << 24) | (buf[pos] << 16) | (buf[pos + 1] << 8) | buf[pos + 2]
            ) + 526336
            pos += 3
        else:
            ptr = struct.unpack_from(">I", buf, pos)[0]
            pos += 4
        value, _ = _decode(buf, data_base + ptr, data_base)
        return value, pos

    if dtype == 0:  # extended type
        dtype = 7 + buf[pos]
        pos += 1

    if size == 29:
        size = 29 + buf[pos]
        pos += 1
    elif size == 30:
        size = 285 + struct.unpack_from(">H", buf, pos)[0]
        pos += 2
    elif size == 31:
        size = 65821 + (
            (buf[pos] << 16) | (buf[pos + 1] << 8) | buf[pos + 2]
        )
        pos += 3

    if dtype == 2:  # utf8 string
        return buf[pos : pos + size].decode("utf-8"), pos + size
    if dtype == 3:  # double (size always 8)
        return struct.unpack_from(">d", buf, pos)[0], pos + 8
    if dtype == 4:  # bytes
        return bytes(buf[pos : pos + size]), pos + size
    if dtype in (5, 6, 9, 10):  # uint16/32/64/128: big-endian, 0..size bytes
        return int.from_bytes(buf[pos : pos + size], "big"), pos + size
    if dtype == 7:  # map: size = entry count
        out = {}
        for _ in range(size):
            k, pos = _decode(buf, pos, data_base)
            v, pos = _decode(buf, pos, data_base)
            out[k] = v
        return out, pos
    if dtype == 8:  # int32
        v = int.from_bytes(buf[pos : pos + size], "big")
        if size == 4 and v >= 1 << 31:
            v -= 1 << 32
        return v, pos + size
    if dtype == 11:  # array
        out = []
        for _ in range(size):
            v, pos = _decode(buf, pos, data_base)
            out.append(v)
        return out, pos
    if dtype == 14:  # boolean: value IS the size field
        return size != 0, pos
    if dtype == 15:  # float (size always 4)
        return struct.unpack_from(">f", buf, pos)[0], pos + 4
    raise MMDBError(f"unsupported mmdb data type {dtype}")


class MMDBReader:
    """Parsed .mmdb: metadata + search tree + data section."""

    def __init__(self, buf: bytes):
        self.buf = buf
        marker = buf.rfind(_METADATA_MARKER)
        if marker < 0:
            raise MMDBError("not an mmdb file: metadata marker missing")
        meta_start = marker + len(_METADATA_MARKER)
        self.metadata, _ = _decode(buf, meta_start, meta_start)
        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])
        if self.record_size not in (24, 28, 32):
            raise MMDBError(f"bad record_size {self.record_size}")
        self.ip_version = int(self.metadata.get("ip_version", 6))
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_base = self.tree_size + _DATA_SEPARATOR

    @classmethod
    def open(cls, path: str) -> "MMDBReader":
        with open(path, "rb") as fh:
            return cls(fh.read())

    def _record(self, node: int, side: int) -> int:
        b = self.buf
        off = node * self.node_bytes
        if self.record_size == 24:
            off += side * 3
            return (b[off] << 16) | (b[off + 1] << 8) | b[off + 2]
        if self.record_size == 32:
            off += side * 4
            return struct.unpack_from(">I", b, off)[0]
        # 28: the middle byte's high nibble belongs to the LEFT record
        if side == 0:
            return ((b[off + 3] & 0xF0) << 20) | (b[off] << 16) | (b[off + 1] << 8) | b[off + 2]
        return ((b[off + 3] & 0x0F) << 24) | (b[off + 4] << 16) | (b[off + 5] << 8) | b[off + 6]

    def _data_at(self, record: int) -> Any:
        # spec: pointer = (record - node_count) + search_tree_size;
        # the first 16 bytes past the tree are the separator
        off = self.tree_size + (record - self.node_count)
        if off < self.data_base:
            raise MMDBError("record points into the data separator")
        value, _ = _decode(self.buf, off, self.data_base)
        return value

    def lookup(self, ip: str) -> Any | None:
        """Point lookup of a dotted-quad IPv4 (or colon IPv6) string —
        driver-side; use mmdb_dim + enrich_cidr for data-plane joins."""
        import ipaddress

        addr = ipaddress.ip_address(ip)
        bits = addr.max_prefixlen
        if addr.version == 4 and self.ip_version == 6:
            # IPv4 in a v6 tree: 96 leading zero bits (::a.b.c.d);
            # ::ffff:0:0/96-rooted trees alias into the same subtree
            # via their own tree structure
            key = int(addr)
            bits = 128
        else:
            key = int(addr)
        node = 0
        for i in range(bits - 1, -1, -1):
            if node >= self.node_count:
                break
            node = self._record(node, (key >> i) & 1)
        if node == self.node_count:
            return None
        if node > self.node_count:
            return self._data_at(node)
        return None

    def networks(self) -> Iterator[tuple[str, Any]]:
        """DFS-enumerate every network with data: yields
        ('a.b.c.d/len', record) for IPv4 space (including the v4
        subtree of a v6 database), ('x::/len' form, record) for
        native IPv6 networks."""
        import ipaddress

        depth_total = 32 if self.ip_version == 4 else 128
        stack = [(0, 0, 0)]  # node, prefix-int, depth
        while stack:
            node, prefix, depth = stack.pop()
            if node == self.node_count:
                continue  # no data
            if node > self.node_count:
                value = self._data_at(node)
                pad = depth_total - depth
                net_int = prefix << pad
                if self.ip_version == 4:
                    cidr = f"{ipaddress.IPv4Address(net_int)}/{depth}"
                elif depth >= 96 and (net_int >> 32) in (0, 0xFFFF):
                    # v4-mapped / v4-compatible inside a v6 tree
                    cidr = f"{ipaddress.IPv4Address(net_int & 0xFFFFFFFF)}/{depth - 96}"
                else:
                    cidr = f"{ipaddress.IPv6Address(net_int)}/{depth}"
                yield cidr, value
                continue
            if depth >= depth_total:
                raise MMDBError("search tree deeper than the address width")
            stack.append((self._record(node, 1), (prefix << 1) | 1, depth + 1))
            stack.append((self._record(node, 0), prefix << 1, depth + 1))


def _flatten(d: Any, prefix: str = "") -> dict[str, Any]:
    """geoip records are nested maps ({'country': {'iso_code': ...}});
    flatten to dotted column names for the dimension table."""
    out: dict[str, Any] = {}
    if isinstance(d, dict):
        for k, v in d.items():
            key = f"{prefix}.{k}" if prefix else str(k)
            out.update(_flatten(v, key))
    elif isinstance(d, list):
        for i, v in enumerate(d):
            out.update(_flatten(v, f"{prefix}.{i}"))
    else:
        out[prefix] = d
    return out


def mmdb_dim(spark, path: str, fields: list[str] | None = None):
    """Read an .mmdb into a `(cidr, <field>...)` dimension DataFrame
    for `enrich_cidr`'s broadcast range join. `fields` selects (and
    orders) flattened record columns ('country.iso_code' style); None
    = union of all fields seen, sorted. All values surface as strings
    (enrichment-table semantics — the reference's CSV tables are
    untyped too; cast downstream as needed)."""
    reader = MMDBReader.open(path)
    rows = []
    keys: set[str] = set()
    flat_nets = []
    for cidr, rec in reader.networks():
        f = _flatten(rec)
        keys.update(f)
        flat_nets.append((cidr, f))
    cols = fields if fields is not None else sorted(keys)
    for cidr, f in flat_nets:
        rows.append(
            (cidr, *[None if f.get(c) is None else str(f[c]) for c in cols])
        )
    safe = [c.replace(".", "_") for c in cols]
    schema = "cidr string, " + ", ".join(f"`{c}` string" for c in safe)
    return spark.createDataFrame(rows, schema)
