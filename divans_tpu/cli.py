"""Command-line interface (reference: src/bin/divans.rs main, :1198-1712).

    python -m divans_tpu.cli [mode] [flags] [infile [outfile]]

Modes (default -c):
  -c            compress raw bytes      (passthrough if already compressed)
  -d            decompress
  -i            compress from textual IR (the oracle path, divans.rs:945-979)
  -ir           dump the matcher's IR as text
  -recode       execute textual IR into raw bytes (no entropy coding)

Flags (a subset of the reference's ~40, same spellings where they exist):
  -q<N>         quality 1..11 (e.g. -q9, -q11)
  -w<N>         log2 window size 10..24
  -bs<N>        metablock size in bytes (TPU-native knob; power of two)
  -cm / -nocm   enable/disable the literal context map
  -mixing=<N>   dynamic context mixing level 0..14
  -speed=<inc>,<lim>  literal adaptation speed
  -deferred[=N] chunk-deferred adaptation profile (device-speed path;
                N = chunk nibbles, default 256; ~+0.4% ratio)
  -blocksplit   literal block-type segmentation + per-segment strides
                (ratio mode on heterogeneous data; golden-engine decode)
  -cmapcluster[=K] data-adaptive literal context map: cluster the 64
                utf8 contexts to <= K shared priors (default 16;
                measured ratio-neutral on adaptive CDFs — map-coding
                parity feature; golden-engine encode)
  -streaming[=N] bounded-latency streamed frames: sub-frame chunk
                table so a reader emits output every ~N input bytes
                (default 64 KiB) regardless of metablock size
                (reference mux.rs interleave; golden encode path)
  -priormask[=q] per-context prior-bitmask detection (stride-vs-context
                prior per literal context; ratio mode, golden decode)
  -serial       force the golden serial engine (no device batching)
  -bill         per-substate bit accounting (reference `billing`);
                with -v adds the per-CDF count/cost/entropy rows
                (reference `debug_entropy`)
  -timing       stage timeline to stderr (threadlog analog, tracelog.py)
  -v            print per-file ratio to stderr
  -version      print version
"""
from __future__ import annotations

import sys

from .options import DivansOptions
from .probability.speed import Speed
from . import __version__


def _fail(msg: str) -> "NoReturn":
    print(f"divans_tpu: {msg}", file=sys.stderr)
    raise SystemExit(2)


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    mode = "-c"
    opts = {}
    engine = "auto"
    verbose = False
    files: list[str] = []
    for a in argv:
        if a in ("-c", "-d", "-i", "-ir", "-recode", "--recode"):
            mode = a.lstrip("-")
        elif a.startswith("-q") and a[2:].replace(".", "").isdigit():
            opts["quality"] = min(11, max(1, int(float(a[2:]))))
        elif a.startswith("-w") and a[2:].isdigit():
            opts["window_size"] = int(a[2:])
        elif a.startswith("-bs") and a[3:].isdigit():
            opts["metablock_size"] = int(a[3:])
        elif a == "-cm":
            opts["use_context_map"] = True
        elif a == "-nocm":
            opts["use_context_map"] = False
            opts.setdefault("dynamic_context_mixing", 0)
        elif a.startswith("-mixing="):
            opts["dynamic_context_mixing"] = int(a.split("=")[1])
        elif a.startswith("-speed="):
            inc, lim = a.split("=")[1].split(",")
            sp = Speed(int(inc), int(lim))
            opts["literal_adaptation"] = (sp, sp, sp, sp)
        elif a.startswith("-deferred"):
            # -deferred[=N]: chunk-deferred adaptation (codec/deferred.py);
            # N = chunk nibbles (power of two in [16, 1024]; default 256)
            opts["chunk_nibbles"] = int(a.split("=")[1]) if "=" in a else 256
        elif a.startswith("-priormask"):
            # per-context prior-bitmask detection (ir/detect.py)
            opts["prior_bitmask_detection"] = \
                int(a.split("=")[1]) if "=" in a else 1
        elif a == "-blocksplit":
            # literal block-type segmentation (ir/blocks.py): ratio mode
            opts["block_split"] = True
        elif a.startswith("-cmapcluster"):
            # clustered literal context map (ir/cmaps.py)
            opts["cmap_clustering"] = \
                int(a.split("=")[1]) if "=" in a else 16
        elif a.startswith("-streaming"):
            # bounded-latency streamed frames (sub-frame chunk table;
            # N = chunk bytes, default 64 KiB)
            opts["streaming_chunk_bytes"] = \
                int(a.split("=")[1]) if "=" in a else 1 << 16
        elif a == "-serial":
            engine = "golden"
        elif a == "-bill":
            engine = "bill"
        elif a == "-v":
            verbose = True
        elif a == "-timing":
            # stage timeline (the reference's threadlog analog, tracelog.py)
            from . import tracelog
            tracelog.enable()
        elif a in ("-version", "--version"):
            print(f"divans_tpu {__version__}")
            return 0
        elif a in ("-h", "--help"):
            print(__doc__)
            return 0
        elif a.startswith("-"):
            _fail(f"unknown flag {a} (see -h)")
        else:
            files.append(a)

    if opts.get("quality", 0) >= 11 and "metablock_size" not in opts:
        # q11 is the max-ratio point: default to the largest model domain
        # (the reference sizes its window by quality the same way,
        # src/divans_compressor.rs:90-91; brotli-q11's -w24 comparator).
        # Pass -bs to trade ratio back for decode parallelism.
        opts["metablock_size"] = 1 << 24
    options = DivansOptions(**opts)
    data = (open(files[0], "rb").read() if files
            else sys.stdin.buffer.read())
    out = _run(mode, data, options, engine, verbose)
    if len(files) > 1:
        open(files[1], "wb").write(out)
    else:
        sys.stdout.buffer.write(out)
    if verbose and mode in ("c", "i"):
        print(f"ratio {len(out) / max(1, len(data)):.4f}", file=sys.stderr)
    from . import tracelog
    if tracelog.events():
        print(tracelog.report(), file=sys.stderr)
    return 0


def _run(mode: str, data: bytes, options: DivansOptions, engine: str,
         verbose: bool = False) -> bytes:
    from . import constants
    from .codec import engine_np

    if mode == "c":
        if data[:4] == constants.MAGIC:   # already compressed: passthrough
            return data                   # (reference divans.rs:884-886)
        if engine == "golden":
            return engine_np.compress(data, options)
        if engine == "bill":              # per-substate bit accounting
            from .codec import jax_engine, billing
            bits: dict = {}
            out = jax_engine.compress(data, options, billing_out=bits)
            print(billing.format_table(bits, len(data), len(out)),
                  file=sys.stderr)
            if verbose and "__detail__" in bits:
                # debug_entropy analog: per-CDF count/cost/entropy rows
                print(bits["__detail__"], file=sys.stderr)
            return out
        from .api import compress
        return compress(data, options)
    if mode == "d":
        if engine == "golden":
            return engine_np.decompress(data)
        from .api import decompress
        return decompress(data)
    from .ir import ir_text
    if mode == "recode":
        _w, commands = ir_text.parse(data.decode())
        return ir_text.recode(commands)
    if mode == "i":
        _w, commands = ir_text.parse(data.decode())
        raw = ir_text.recode(commands)
        mb = 1 << max(12, (max(1, len(raw)) - 1).bit_length())
        import dataclasses
        options = dataclasses.replace(options, metablock_size=min(mb, 1 << 24))
        from .codec.engine_np import encode_metablock
        from .container import format as fmt
        from .container.crc32c import crc32c
        from .codec.layout import profile_for_options, PROFILE_FLAGS
        cmd_b, lit_b = encode_metablock(raw, commands, options)
        return fmt.serialize([fmt.MetablockFrame(len(raw), cmd_b, lit_b)],
                             options.window_size, options.mb_log2,
                             crc32c(raw),
                             flags=PROFILE_FLAGS[profile_for_options(options)])
    if mode == "ir":
        from .ir.matcher import build_commands
        mb = options.metablock_size
        lines = []
        for off in range(0, len(data), mb):
            lines.append(ir_text.dump(
                build_commands(data[off:off + mb], options),
                options.window_size))
        return "".join(lines).encode()
    _fail(f"unknown mode {mode}")


if __name__ == "__main__":
    raise SystemExit(main())
