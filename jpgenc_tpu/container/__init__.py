from jpgenc_tpu.container.jfif import build_headers  # noqa: F401
from jpgenc_tpu.container.parser import parse_jpeg  # noqa: F401
