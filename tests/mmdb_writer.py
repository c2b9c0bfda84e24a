"""Minimal MaxMind-DB WRITER — test fixture only (the product code is
the reader, vector_spark/sources/mmdb.py). Emits spec-valid .mmdb
bytes: binary search tree (record size 24/28/32), 16-byte separator,
data section (maps/strings/uints/doubles/bools/arrays), metadata
section. Networks must be disjoint (geoip block tables are)."""

from __future__ import annotations

import ipaddress
import struct


def _ctrl(dtype: int, size: int) -> bytes:
    ext = b""
    if dtype > 7:
        ext = bytes([dtype - 7])
        dtype = 0
    if size < 29:
        return bytes([(dtype << 5) | size]) + ext
    if size < 29 + 256:
        return bytes([(dtype << 5) | 29]) + ext + bytes([size - 29])
    return bytes([(dtype << 5) | 30]) + ext + struct.pack(">H", size - 285)


def _enc(v) -> bytes:
    if isinstance(v, bool):  # before int: bool is an int subclass
        return bytes([(0 << 5) | (1 if v else 0), 14 - 7])
    if isinstance(v, str):
        b = v.encode("utf-8")
        return _ctrl(2, len(b)) + b
    if isinstance(v, float):
        return _ctrl(3, 8) + struct.pack(">d", v)
    if isinstance(v, int):
        if v < 0:
            raise ValueError("test writer only encodes unsigned ints")
        nbytes = (v.bit_length() + 7) // 8
        body = v.to_bytes(nbytes, "big")
        if v < 1 << 16:
            return _ctrl(5, nbytes) + body
        if v < 1 << 32:
            return _ctrl(6, nbytes) + body
        return _ctrl(9, nbytes) + body
    if isinstance(v, dict):
        out = _ctrl(7, len(v))
        for k, val in v.items():
            out += _enc(str(k)) + _enc(val)
        return out
    if isinstance(v, (list, tuple)):
        out = _ctrl(11, len(v))
        for val in v:
            out += _enc(val)
        return out
    raise ValueError(f"unsupported fixture type {type(v)}")


def _uint64(v: int) -> bytes:
    b = v.to_bytes((v.bit_length() + 7) // 8 or 1, "big")
    return _ctrl(9, len(b)) + b


def build_mmdb(
    networks: list[tuple[str, dict]],
    record_size: int = 24,
    ip_version: int = 4,
    database_type: str = "Test-GeoIP",
) -> bytes:
    width = 32 if ip_version == 4 else 128
    # ---- data section: one encoded map per network ----
    data = b""
    offsets = []
    for _, rec in networks:
        offsets.append(len(data))
        data += _enc(rec)

    # ---- search tree ----
    nodes: list[list] = [[None, None]]
    for idx, (cidr, _) in enumerate(networks):
        net = ipaddress.ip_network(cidr)
        if (net.version == 4) != (ip_version == 4):
            raise ValueError("fixture: network family must match ip_version")
        addr = int(net.network_address)
        node = 0
        for i in range(net.prefixlen):
            bit = (addr >> (width - 1 - i)) & 1
            cur = nodes[node][bit]
            if i == net.prefixlen - 1:
                if cur is not None:
                    raise ValueError(f"overlapping network {cidr}")
                nodes[node][bit] = ("data", idx)
            else:
                if cur is None:
                    nodes.append([None, None])
                    cur = ("node", len(nodes) - 1)
                    nodes[node][bit] = cur
                elif cur[0] == "data":
                    raise ValueError(f"nested network {cidr}")
                node = cur[1]

    node_count = len(nodes)

    def record_value(slot) -> int:
        if slot is None:
            return node_count  # no data
        kind, i = slot
        if kind == "node":
            return i
        return node_count + 16 + offsets[i]

    tree = b""
    for left, right in nodes:
        lv, rv = record_value(left), record_value(right)
        if record_size == 24:
            tree += lv.to_bytes(3, "big") + rv.to_bytes(3, "big")
        elif record_size == 32:
            tree += struct.pack(">II", lv, rv)
        elif record_size == 28:
            mid = ((lv >> 24) & 0xF) << 4 | ((rv >> 24) & 0xF)
            tree += (lv & 0xFFFFFF).to_bytes(3, "big") + bytes([mid]) + (
                rv & 0xFFFFFF
            ).to_bytes(3, "big")
        else:
            raise ValueError(f"record_size {record_size}")

    # ---- metadata ----
    meta = (
        _ctrl(7, 9)
        + _enc("binary_format_major_version") + _enc(2)
        + _enc("binary_format_minor_version") + _enc(0)
        + _enc("build_epoch") + _uint64(1700000000)
        + _enc("database_type") + _enc(database_type)
        + _enc("description") + _enc({"en": "unit-test fixture"})
        + _enc("ip_version") + _enc(ip_version)
        + _enc("languages") + _enc(["en"])
        + _enc("node_count") + _enc(node_count)
        + _enc("record_size") + _enc(record_size)
    )
    return tree + b"\x00" * 16 + data + b"\xab\xcd\xefMaxMind.com" + meta
