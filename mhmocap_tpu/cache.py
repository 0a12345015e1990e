"""Host-aware persistent-compile-cache locations.

XLA:CPU persistent-cache entries embed AOT machine code specialized
to the COMPILING host's CPU features, but the cache key does not
include those features: loading an entry produced on a different
machine logs `cpu_aot_loader` feature-mismatch errors and can
SIGILL/SIGABRT the process (observed as rc=-6 sweep-worker crashes
when a round ran on a different host than the cache producer). Keying
the CPU cache DIRECTORY by the host's CPU-feature fingerprint makes
every cache hit host-compatible by construction. TPU caches are
host-independent (the executable targets the TPU) and keep sharing
one directory.
"""

import hashlib
import os
import platform


def host_cpu_fingerprint() -> str:
    """8-hex digest of the host's CPU feature flags."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1]
                                            .split()))
                    break
    except OSError:
        pass
    if not flags:
        flags = platform.processor() or platform.machine()
    return hashlib.sha1(flags.encode()).hexdigest()[:8]


def cpu_cache_dir(root: str) -> str:
    """Compile-cache directory for CPU (host-fingerprinted)."""
    return os.path.join(root, f".jax_cache_cpu_{host_cpu_fingerprint()}")
