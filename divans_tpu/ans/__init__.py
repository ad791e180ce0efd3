from .coder_np import ANSEncoder, ANSDecoder  # noqa: F401
