"""The command IR — brotli-style commands, the interchange between the
matcher stage and the coding stage (reference: brotli crate Command enum,
re-exported at src/interface.rs:25; command nibbles src/codec/mod.rs:143-158).
"""
from __future__ import annotations

import dataclasses
from typing import Union

from ..probability.speed import Speed, DEFAULT_LITERAL_SPEED
from ..constants import LITERAL_PREDICTION_MODE_UTF8

NUM_MIXING_VALUES = 8192


@dataclasses.dataclass
class Literal:
    data: bytes
    high_entropy: bool = False


@dataclasses.dataclass
class Copy:
    distance: int
    num_bytes: int


@dataclasses.dataclass
class Dict:
    word_size: int      # 4..24
    word_id: int        # < 2^DICT_BITS[word_size]
    transform: int      # < 121
    final_size: int     # length after transform (for ring-buffer accounting)


@dataclasses.dataclass
class BlockSwitchLiteral:
    block_type: int
    stride: int = 0


@dataclasses.dataclass
class BlockSwitchCommand:
    block_type: int


@dataclasses.dataclass
class BlockSwitchDistance:
    block_type: int


@dataclasses.dataclass
class PredictionMode:
    """Model-configuration header command.  Carries everything the decoder
    needs: the decoder is configuration-free (codec/context_map.rs:31-42)."""
    literal_prediction_mode: int = LITERAL_PREDICTION_MODE_UTF8
    context_mixing: int = 0          # 0..7 on the wire; &3 = mixer math level
    adv_context_map: int = 0
    prior_depth: int = 0
    # adaptation speeds: [stride-low, stride-high, cm-low, cm-high]
    speeds: tuple[Speed, Speed, Speed, Speed] = (
        DEFAULT_LITERAL_SPEED,) * 4
    literal_context_map: bytes = b""     # 64 entries per literal block type
    distance_context_map: bytes = b""    # 4 entries per distance block type
    mixing_values: bytes = b""           # NUM_MIXING_VALUES entries or empty


Command = Union[Literal, Copy, Dict, BlockSwitchLiteral, BlockSwitchCommand,
                BlockSwitchDistance, PredictionMode]

CMD_NIBBLE = {Copy: 0x1, Dict: 0x2, Literal: 0x3, BlockSwitchLiteral: 0x4,
              BlockSwitchCommand: 0x5, BlockSwitchDistance: 0x6,
              PredictionMode: 0x7}
END_NIBBLE = 0xF
