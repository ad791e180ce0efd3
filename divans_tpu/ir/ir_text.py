"""Textual IR format — the debugging oracle.

Mirrors the reference CLI's IR dialect (src/bin/divans.rs:191-483,
command_parse): one command per line, used to (a) drive the coder from a
hand-written command stream (`-i`), (b) regenerate raw bytes from IR
without entropy coding (`--recode`), and (c) dump the matcher's output
(`--ir`).  Lines:

    window <log2>
    prediction <utf8|sign|lsb6|msb6> [lcontextmap b...] [dcontextmap b...]
               [mixingvalues n...] [cmspeedinc i] [cmspeedmax m]
               [stspeedinc i] [stspeedmax m]
    ltype <N> [stride]   | ctype <N> | dtype <N>
    copy <N> from <D>
    dict <N> word <LEN>,<IDX> func <T>
    insert <N> "<data>"    (data printf-escaped, reference util.rs)
"""
from __future__ import annotations

from . import commands as cmds
from ..probability.speed import Speed, DEFAULT_LITERAL_SPEED
from .. import dictionary

_PM_NAMES = {"lsb6": 0, "msb6": 1, "sign": 2, "utf8": 3}
_PM_RNAMES = {v: k for k, v in _PM_NAMES.items()}


def _escape(data: bytes) -> str:
    out = []
    for b in data:
        if b in (0x5C,):
            out.append("\\\\")
        elif b == 0x22:
            out.append('\\"')
        elif 0x20 <= b < 0x7F:
            out.append(chr(b))
        else:
            out.append(f"\\x{b:02x}")
    return "".join(out)


def _unescape(s: str) -> bytes:
    out = bytearray()
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "x" and i + 3 < len(s) + 1:
                out.append(int(s[i + 2:i + 4], 16))
                i += 4
                continue
            out.append(ord(nxt))
            i += 2
            continue
        out.append(ord(ch))
        i += 1
    return bytes(out)


def dump(commands: list[cmds.Command], window: int) -> str:
    """Commands -> IR text."""
    lines = [f"window {window}"]
    for c in commands:
        if isinstance(c, cmds.PredictionMode):
            parts = [f"prediction {_PM_RNAMES[c.literal_prediction_mode]}"]
            if c.literal_context_map:
                parts.append("lcontextmap " + " ".join(
                    str(b) for b in c.literal_context_map))
            if c.distance_context_map:
                parts.append("dcontextmap " + " ".join(
                    str(b) for b in c.distance_context_map))
            if any(c.mixing_values):
                parts.append("mixingvalues " + " ".join(
                    str(b) for b in c.mixing_values))
            sp = c.speeds
            parts.append(f"stspeedinc {sp[0].inc} stspeedmax {sp[0].lim}")
            parts.append(f"cmspeedinc {sp[2].inc} cmspeedmax {sp[2].lim}")
            lines.append(" ".join(parts))
        elif isinstance(c, cmds.Literal):
            lines.append(f'insert {len(c.data)} "{_escape(c.data)}"')
        elif isinstance(c, cmds.Copy):
            lines.append(f"copy {c.num_bytes} from {c.distance}")
        elif isinstance(c, cmds.Dict):
            lines.append(f"dict {c.final_size} word "
                         f"{c.word_size},{c.word_id} func {c.transform}")
        elif isinstance(c, cmds.BlockSwitchLiteral):
            lines.append(f"ltype {c.block_type} {c.stride}")
        elif isinstance(c, cmds.BlockSwitchCommand):
            lines.append(f"ctype {c.block_type}")
        elif isinstance(c, cmds.BlockSwitchDistance):
            lines.append(f"dtype {c.block_type}")
        else:
            raise ValueError(f"cannot dump {c!r}")
    return "\n".join(lines) + "\n"


def parse(text: str) -> tuple[int, list[cmds.Command]]:
    """IR text -> (window, commands)."""
    window = 22
    out: list[cmds.Command] = []
    for raw_line in text.splitlines():
        line = raw_line.strip()
        if not line or line.startswith("#"):
            continue
        tok = line.split()
        kind = tok[0]
        if kind == "window":
            window = int(tok[1])
        elif kind == "prediction":
            out.append(_parse_prediction(line, tok))
        elif kind == "insert":
            n = int(tok[1])
            first = line.index('"')
            last = line.rindex('"')
            data = _unescape(line[first + 1:last])
            assert len(data) == n, (len(data), n, line[:60])
            out.append(cmds.Literal(data))
        elif kind == "copy":
            assert tok[2] == "from"
            out.append(cmds.Copy(distance=int(tok[3]), num_bytes=int(tok[1])))
        elif kind == "dict":
            assert tok[2] == "word" and tok[4] == "func"
            wlen, wid = tok[3].split(",")
            out.append(cmds.Dict(word_size=int(wlen), word_id=int(wid),
                                 transform=int(tok[5]),
                                 final_size=int(tok[1])))
        elif kind == "ltype":
            out.append(cmds.BlockSwitchLiteral(
                int(tok[1]), int(tok[2]) if len(tok) > 2 else 0))
        elif kind == "ctype":
            out.append(cmds.BlockSwitchCommand(int(tok[1])))
        elif kind == "dtype":
            out.append(cmds.BlockSwitchDistance(int(tok[1])))
        else:
            raise ValueError(f"unknown IR line: {line[:60]}")
    return window, out


def _parse_prediction(line: str, tok: list[str]) -> cmds.PredictionMode:
    pm = _PM_NAMES[tok[1]]
    lcm, dcm, mv = b"", b"", b""
    st_inc = st_lim = cm_inc = cm_lim = None
    i = 2
    while i < len(tok):
        key = tok[i]
        if key in ("lcontextmap", "dcontextmap", "mixingvalues"):
            j = i + 1
            vals = []
            while j < len(tok) and tok[j].isdigit():
                vals.append(int(tok[j]))
                j += 1
            if key == "lcontextmap":
                lcm = bytes(vals)
            elif key == "dcontextmap":
                dcm = bytes(vals)
            else:
                mv = bytes(vals)
            i = j
        elif key in ("stspeedinc", "stspeedmax", "cmspeedinc", "cmspeedmax"):
            v = int(tok[i + 1])
            if key == "stspeedinc":
                st_inc = v
            elif key == "stspeedmax":
                st_lim = v
            elif key == "cmspeedinc":
                cm_inc = v
            else:
                cm_lim = v
            i += 2
        else:
            raise ValueError(f"unknown prediction field {key}")
    d = DEFAULT_LITERAL_SPEED
    st = Speed(st_inc if st_inc is not None else d.inc,
               st_lim if st_lim is not None else d.lim)
    cm = Speed(cm_inc if cm_inc is not None else 8,
               cm_lim if cm_lim is not None else 8192)
    return cmds.PredictionMode(
        literal_prediction_mode=pm, context_mixing=1 if lcm else 0,
        speeds=(st, st, cm, cm),
        literal_context_map=lcm, distance_context_map=dcm, mixing_values=mv)


def recode(commands: list[cmds.Command]) -> bytes:
    """Execute the IR into raw bytes with no entropy coding (the
    reference's --recode oracle, cmd_to_raw/mod.rs:378-406)."""
    out = bytearray()
    d = dictionary.load()
    for c in commands:
        if isinstance(c, cmds.Literal):
            out += c.data
        elif isinstance(c, cmds.Copy):
            if not 1 <= c.distance <= len(out):
                raise ValueError(f"copy distance {c.distance} out of window")
            start = len(out) - c.distance
            for i in range(c.num_bytes):
                out.append(out[start + i])
        elif isinstance(c, cmds.Dict):
            word = d.transform_word(c.word_size, c.word_id, c.transform)
            assert len(word) == c.final_size, (len(word), c.final_size)
            out += word
        elif isinstance(c, (cmds.PredictionMode, cmds.BlockSwitchLiteral,
                            cmds.BlockSwitchCommand, cmds.BlockSwitchDistance)):
            pass
        else:
            raise ValueError(f"cannot recode {c!r}")
    return bytes(out)
