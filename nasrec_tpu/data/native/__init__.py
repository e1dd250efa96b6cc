"""ctypes bindings for the native TSV parser (with auto-build + fallback)."""

from nasrec_tpu.data.native.binding import (
    native_available,
    parse_ctr_buffer,
    read_batches_native,
)
