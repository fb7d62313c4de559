"""JFIF marker parser (T.81 section B; SURVEY.md component #19).

Walks the segment structure of a baseline JPEG produced by this engine (or any
baseline encoder emitting SOI/APP/DQT/SOF0/DHT/DRI/SOS), collecting quant
tables, Huffman tables, frame geometry, and the raw entropy-coded scan.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from jpgenc_tpu import tables as T
from jpgenc_tpu.huffman import HuffTable, build_codes


@dataclass
class FrameComponent:
    comp_id: int
    hs: int
    vs: int
    qtab: int
    dc_tab: int = 0
    ac_tab: int = 0


@dataclass
class ParsedJpeg:
    height: int = 0
    width: int = 0
    precision: int = 8
    comps: list[FrameComponent] = field(default_factory=list)
    qtables: dict[int, np.ndarray] = field(default_factory=dict)   # natural order
    dc_tables: dict[int, HuffTable] = field(default_factory=dict)
    ac_tables: dict[int, HuffTable] = field(default_factory=dict)
    restart_interval: int = 0
    scan_data: bytes = b""     # entropy bytes incl. RSTn, excl. EOI
    app0: bytes = b""

    @property
    def subsampling(self) -> str:
        if len(self.comps) == 1:
            return "gray"
        hs, vs = self.comps[0].hs, self.comps[0].vs
        return {(1, 1): "444", (2, 1): "422", (2, 2): "420"}[(hs, vs)]


def parse_jpeg(data: bytes) -> ParsedJpeg:
    out = ParsedJpeg()
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    i = 2
    n = len(data)
    while i < n:
        if data[i] != 0xFF:
            raise ValueError(f"expected marker at offset {i}")
        marker = data[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:
            raise ValueError("unexpected RST outside scan")
        seg_len = int.from_bytes(data[i:i + 2], "big")
        payload = data[i + 2:i + seg_len]
        i += seg_len

        if marker == 0xE0:
            out.app0 = payload
        elif marker == 0xDB:  # DQT (possibly several tables in one segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                zz = np.frombuffer(payload[p:p + 64], dtype=np.uint8).astype(np.int32)
                nat = np.zeros(64, dtype=np.int32)
                nat[T.ZIGZAG] = zz  # payload is zigzag; store natural
                out.qtables[tq] = nat
                p += 64
        elif marker == 0xC0:  # SOF0
            out.precision = payload[0]
            out.height = int.from_bytes(payload[1:3], "big")
            out.width = int.from_bytes(payload[3:5], "big")
            nc = payload[5]
            for c in range(nc):
                cid, samp, tq = payload[6 + 3 * c:9 + 3 * c]
                out.comps.append(FrameComponent(cid, samp >> 4, samp & 0xF, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported SOF marker 0xFF{marker:02X} (baseline only)")
        elif marker == 0xC4:  # DHT (possibly several)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = np.frombuffer(payload[p + 1:p + 17], dtype=np.uint8).astype(np.int32)
                nv = int(bits.sum())
                vals = np.frombuffer(payload[p + 17:p + 17 + nv], dtype=np.uint8).astype(np.int32)
                tbl = build_codes(bits, vals)
                (out.ac_tables if tc else out.dc_tables)[th] = tbl
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            out.restart_interval = int.from_bytes(payload[:2], "big")
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            for s in range(ns):
                cs, tda = payload[1 + 2 * s], payload[2 + 2 * s]
                for c in out.comps:
                    if c.comp_id == cs:
                        c.dc_tab, c.ac_tab = tda >> 4, tda & 0xF
            # entropy data runs until the next non-RST marker (EOI for baseline)
            j = i
            while j < n - 1:
                if data[j] == 0xFF and data[j + 1] != 0x00 and not (0xD0 <= data[j + 1] <= 0xD7):
                    break
                j += 1
            out.scan_data = data[i:j]
            i = j
        # other APPn/COM markers: skipped
    return out
