"""Generate non-self-referential Dolby Vision RPU fixtures.

utils/dolbyvision.py previously round-tripped only against its own
writer. These fixtures are produced by an INDEPENDENT second encoder
implementation, transcribed directly from the publicly documented RPU
bitstream syntax (the field order FFmpeg's libavcodec/dovi_rpudec.c
implements; ETSI GS CCM 001). It shares no code with the module under
test: a different bit-writer design (byte-buffer cursor vs bit list),
and it wraps payloads the way captures appear in practice — HEVC
unspec-62 NAL header (0x7C 0x01), emulation-prevention bytes inserted,
and a CRC32+0x80 trailer the parser must tolerate.

Emits tests/golden/dovi/<name>.bin + <name>.json (expected fields) for
three profiles:
  profile5   — single layer, IPT-PQ-c2: MMR chroma curves, polynomial
               luma, signal_color_space=2, no DM ext blocks
  profile7   — dual layer FEL: disable_residual=0, NLQ LINEAR_DZ
               payload, DM with L1 + L2 trims
  profile81  — single layer HDR10-compatible: polynomial curves,
               DM with L1 + L5 + L6 + L254 (CM v4) blocks

Values are chosen to look like real captures (coef_log2_denom 23,
10-bit BL, source_max_pq 3696 = 1000 nits, etc.). Regenerate only to
change fixtures; tests/test_dolbyvision.py reads the committed bytes.
"""
import json
import os
import struct
import sys
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
OUT = os.path.join(REPO, "tests", "golden", "dovi")


class Bits:
    """MSB-first bit cursor over a growing bytearray (independent of
    the module under test's bit-list writer)."""

    def __init__(self):
        self.buf = bytearray()
        self.nbits = 0

    def put(self, value: int, width: int):
        assert 0 <= value < (1 << width), (value, width)
        for i in range(width - 1, -1, -1):
            if self.nbits % 8 == 0:
                self.buf.append(0)
            if (value >> i) & 1:
                self.buf[-1] |= 0x80 >> (self.nbits % 8)
            self.nbits += 1

    def golomb(self, v: int):
        assert v >= 0
        code = v + 1
        self.put(0, code.bit_length() - 1)
        self.put(code, code.bit_length())

    def sgolomb(self, v: int):
        self.golomb(2 * v - 1 if v > 0 else -2 * v)

    def align(self):
        self.nbits = (self.nbits + 7) & ~7
        while len(self.buf) < self.nbits // 8:
            self.buf.append(0)

    def coef(self, value: int, denom: int, signed: bool):
        """Fixed-point: integer part (s)e-golomb + denom fraction bits."""
        ipart = value >> denom
        frac = value - (ipart << denom)
        if signed:
            self.sgolomb(ipart)
        else:
            self.golomb(ipart)
        self.put(frac, denom)


def add_emulation_prevention(rbsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def fx(f: float, denom: int) -> int:
    """Float -> fixed-point with 2^denom fractional scaling."""
    return int(round(f * (1 << denom)))


def encode_rpu(cfg: dict) -> bytes:
    """cfg mirrors the JSON expectation dict; returns the rbsp."""
    b = Bits()
    denom = cfg["coef_log2_denom"]
    bl = cfg["bl_bit_depth"]
    el = cfg["el_bit_depth"]
    b.put(25, 8)                                 # rpu_nal_prefix
    b.put(2, 6)                                  # rpu_type
    b.put(cfg["rpu_format"], 11)
    b.put(cfg["vdr_rpu_profile"], 4)
    b.put(cfg["vdr_rpu_level"], 4)
    b.put(1, 1)                                  # vdr_seq_info_present
    b.put(0, 1)                                  # chroma_resampling
    b.put(0, 2)                                  # coef_data_type: fixed
    b.golomb(denom)
    b.put(cfg["vdr_rpu_normalized_idc"], 2)
    b.put(int(cfg["bl_video_full_range_flag"]), 1)
    if (cfg["rpu_format"] & 0x700) == 0:
        b.golomb(bl - 8)
        b.golomb(el - 8)
        b.golomb(cfg["vdr_bit_depth"] - 8)
        b.put(0, 1)                              # spatial_resampling
        b.put(0, 3)                              # reserved
        b.put(0, 1)                              # el_spatial_resampling
        b.put(int(cfg["disable_residual_flag"]), 1)
    b.put(int(cfg["dm_metadata_present"]), 1)
    b.put(0, 1)                                  # use_prev_vdr_rpu
    b.golomb(0)                                  # vdr_rpu_id
    b.golomb(0)                                  # mapping_color_space
    b.golomb(0)                                  # mapping_chroma_format

    for cur in cfg["curves"]:
        piv = cur["pivots"]
        b.golomb(len(piv) - 2)
        b.put(piv[0], bl)
        for lo, hi in zip(piv, piv[1:]):
            b.put(hi - lo, bl)

    nlq = cfg.get("nlq")
    if (cfg["rpu_format"] & 0x700) == 0 and \
            not cfg["disable_residual_flag"]:
        b.put(nlq["method_idc"], 3)
        b.put(nlq["pivots"][0], bl)
        b.put(nlq["pivots"][1], bl)

    b.golomb(0)                                  # num_x_partitions_minus1
    b.golomb(0)                                  # num_y_partitions_minus1

    for cur in cfg["curves"]:
        for piece in cur["pieces"]:
            if piece["kind"] == "poly":
                b.golomb(0)                      # mapping_idc
                order = len(piece["coef"]) - 1
                b.golomb(order - 1)
                if order == 1:
                    b.put(0, 1)                  # linear_interp_flag
                for c in piece["coef"]:
                    b.coef(c, denom, signed=True)
            else:                                # MMR
                b.golomb(1)
                b.put(len(piece["rows"]) - 1, 2)
                b.coef(piece["constant"], denom, signed=True)
                for row in piece["rows"]:
                    assert len(row) == 7
                    for c in row:
                        b.coef(c, denom, signed=True)

    if (cfg["rpu_format"] & 0x700) == 0 and \
            not cfg["disable_residual_flag"]:
        for c in range(3):
            b.put(nlq["nlq_offset"][c], el)
            b.coef(nlq["vdr_in_max"][c], denom, signed=False)
            if nlq["method_idc"] == 0:           # LINEAR_DZ
                b.coef(nlq["dz_slope"][c], denom, signed=False)
                b.coef(nlq["dz_threshold"][c], denom, signed=False)

    if cfg["dm_metadata_present"]:
        dm = cfg["dm"]
        b.golomb(0)                              # affected_dm_metadata_id
        b.golomb(0)                              # current_dm_metadata_id
        b.golomb(dm["scene_refresh_flag"])
        for v in dm["ycc_to_rgb_matrix"]:
            b.put(v & 0xFFFF, 16)
        for v in dm["ycc_to_rgb_offset"]:
            b.put(v, 32)
        for v in dm["rgb_to_lms_matrix"]:
            b.put(v & 0xFFFF, 16)
        b.put(dm["signal_eotf"], 16)
        b.put(0, 16)                             # signal_eotf_param0
        b.put(0, 16)                             # signal_eotf_param1
        b.put(0, 32)                             # signal_eotf_param2
        b.put(dm["signal_bit_depth"], 5)
        b.put(dm["signal_color_space"], 2)
        b.put(0, 2)                              # signal_chroma_format
        b.put(dm["signal_full_range_flag"], 2)
        b.put(dm["source_min_pq"], 12)
        b.put(dm["source_max_pq"], 12)
        b.put(dm["source_diagonal"], 10)
        blocks = dm.get("ext_blocks", [])
        b.golomb(len(blocks))
        if blocks:
            b.align()
            for blk in blocks:
                p = Bits()
                lv = blk["level"]
                if lv == 1:
                    p.put(blk["min_pq"], 12)
                    p.put(blk["max_pq"], 12)
                    p.put(blk["avg_pq"], 12)
                elif lv == 2:
                    p.put(blk["target_max_pq"], 12)
                    p.put(blk["trim_slope"], 12)
                    p.put(blk["trim_offset"], 12)
                    p.put(blk["trim_power"], 12)
                    p.put(blk["trim_chroma_weight"], 12)
                    p.put(blk["trim_saturation_gain"], 12)
                    p.put(blk["ms_weight"] & 0x1FFF, 13)
                elif lv == 5:
                    for v in blk["active_area"]:
                        p.put(v, 13)
                elif lv == 6:
                    p.put(blk["max_luminance"], 16)
                    p.put(blk["min_luminance"], 16)
                    p.put(blk["max_cll"], 16)
                    p.put(blk["max_fall"], 16)
                elif lv == 254:
                    p.put(blk["dm_mode"], 8)
                    p.put(blk["dm_version_index"], 8)
                else:
                    raise ValueError(lv)
                p.align()
                b.golomb(len(p.buf))
                b.put(lv, 8)
                for byte in p.buf:
                    b.put(byte, 8)
    b.align()
    return bytes(b.buf)


# standard BT.2020-NCL limited-range decode matrix in the RPU's /8192
# fixed point, and a typical RGB->LMS /16384 matrix — the values real
# captures carry
YCC2RGB = [8192, 0, 12900, 8192, -1534, -3836, 8192, 15201, 0]
YCCOFF = [0, 1 << 27, 1 << 27]
RGB2LMS = [5845, 9702, 837, 2568, 12256, 1561, 0, 679, 15705]

D = 23     # coef_log2_denom


def poly(cs):
    return {"kind": "poly", "coef": [fx(c, D) for c in cs]}


def mmr(const, rows):
    return {"kind": "mmr", "constant": fx(const, D),
            "rows": [[fx(v, D) for v in r] for r in rows]}


def profiles():
    base_dm = {
        "scene_refresh_flag": 1,
        "ycc_to_rgb_matrix": YCC2RGB,
        "ycc_to_rgb_offset": YCCOFF,
        "rgb_to_lms_matrix": RGB2LMS,
        "signal_eotf": 65535,
        "signal_bit_depth": 12,
        "signal_color_space": 0,
        "signal_full_range_flag": 1,
        "source_min_pq": 62,
        "source_max_pq": 3696,
        "source_diagonal": 42,
    }
    p5 = {
        "rpu_format": 0,
        "vdr_rpu_profile": 0, "vdr_rpu_level": 0,
        "coef_log2_denom": D, "vdr_rpu_normalized_idc": 1,
        "bl_video_full_range_flag": True,
        "bl_bit_depth": 10, "el_bit_depth": 10, "vdr_bit_depth": 12,
        "disable_residual_flag": True,
        "dm_metadata_present": True,
        "curves": [
            {"pivots": [0, 1023],
             "pieces": [poly([0.0, 1.0])]},
            {"pivots": [0, 1023],
             "pieces": [mmr(0.5, [[0.1, -0.2, 0.05, 0.3, -0.01,
                                   0.002, -0.004]])]},
            {"pivots": [0, 1023],
             "pieces": [mmr(-0.25, [[0.2, 0.1, -0.05, 0.15, 0.01,
                                     -0.003, 0.006],
                                    [0.01, -0.02, 0.03, -0.04, 0.05,
                                     -0.06, 0.07]])]},
        ],
        "dm": dict(base_dm, signal_color_space=2, ext_blocks=[]),
    }
    p7 = {
        "rpu_format": 0,
        "vdr_rpu_profile": 1, "vdr_rpu_level": 6,
        "coef_log2_denom": D, "vdr_rpu_normalized_idc": 1,
        "bl_video_full_range_flag": False,
        "bl_bit_depth": 10, "el_bit_depth": 10, "vdr_bit_depth": 12,
        "disable_residual_flag": False,
        "dm_metadata_present": True,
        "nlq": {
            "method_idc": 0,                     # LINEAR_DZ
            "pivots": [0, 1023],
            "nlq_offset": [512, 512, 512],
            "vdr_in_max": [fx(1.0, D)] * 3,
            "dz_slope": [fx(2.0, D), fx(2.25, D), fx(2.25, D)],
            "dz_threshold": [fx(0.0625, D)] * 3,
        },
        "curves": [
            {"pivots": [0, 256, 512, 1023],
             "pieces": [poly([0.0, 0.5, 0.25]), poly([0.01, 0.9]),
                        poly([-0.05, 1.1, -0.1])]},
            {"pivots": [0, 1023], "pieces": [poly([0.0, 1.0])]},
            {"pivots": [0, 1023], "pieces": [poly([0.0, 1.0])]},
        ],
        "dm": dict(base_dm, ext_blocks=[
            {"level": 1, "min_pq": 0, "max_pq": 3079, "avg_pq": 1229},
            {"level": 2, "target_max_pq": 2081, "trim_slope": 2048,
             "trim_offset": 2048, "trim_power": 1800,
             "trim_chroma_weight": 2048, "trim_saturation_gain": 2048,
             "ms_weight": -1},
        ]),
    }
    p81 = {
        "rpu_format": 0,
        "vdr_rpu_profile": 1, "vdr_rpu_level": 6,
        "coef_log2_denom": D, "vdr_rpu_normalized_idc": 1,
        "bl_video_full_range_flag": False,
        "bl_bit_depth": 10, "el_bit_depth": 10, "vdr_bit_depth": 12,
        "disable_residual_flag": True,
        "dm_metadata_present": True,
        "curves": [
            {"pivots": [0, 128, 384, 640, 1023],
             "pieces": [poly([0.0, 0.25]), poly([0.002, 0.8, 0.05]),
                        poly([-0.01, 1.05, -0.08]),
                        poly([0.1, 0.7, 0.02])]},
            {"pivots": [0, 1023], "pieces": [poly([0.0, 1.0])]},
            {"pivots": [0, 1023], "pieces": [poly([0.0, 1.0])]},
        ],
        "dm": dict(base_dm, ext_blocks=[
            {"level": 1, "min_pq": 0, "max_pq": 2771, "avg_pq": 819},
            {"level": 5, "active_area": [0, 0, 276, 276]},
            {"level": 6, "max_luminance": 1000, "min_luminance": 1,
             "max_cll": 986, "max_fall": 354},
            {"level": 254, "dm_mode": 0, "dm_version_index": 2},
        ]),
    }
    return {"profile5": p5, "profile7": p7, "profile81": p81}


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, cfg in profiles().items():
        rbsp = encode_rpu(cfg)
        # wrap like a capture: NAL header + EBSP + CRC32 + 0x80 trailer
        payload = add_emulation_prevention(rbsp)
        crc = struct.pack(">I", zlib.crc32(payload))
        nal = bytes([0x7C, 0x01]) + payload + crc + b"\x80"
        with open(os.path.join(OUT, f"{name}.bin"), "wb") as f:
            f.write(nal)
        with open(os.path.join(OUT, f"{name}.json"), "w") as f:
            json.dump(cfg, f, indent=1)
        print(f"{name}: rbsp {len(rbsp)}B, nal {len(nal)}B, "
              f"emulation bytes: {len(payload) - len(rbsp)}")


if __name__ == "__main__":
    sys.exit(main())
