from jpgenc_tpu.ref.encoder import encode  # noqa: F401
