from .commands import (  # noqa: F401
    Command, Literal, Copy, Dict, BlockSwitchLiteral, BlockSwitchCommand,
    BlockSwitchDistance, PredictionMode,
)
