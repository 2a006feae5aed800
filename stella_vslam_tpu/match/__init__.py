from stella_vslam_tpu.match.hamming import (  # noqa: F401
    pairwise_hamming,
    unpack_bits_pm1,
    HAMMING_DIST_THR_LOW,
    HAMMING_DIST_THR_HIGH,
    MAX_HAMMING_DIST,
)
