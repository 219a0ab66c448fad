"""Build the native library: python -m whisper_mlx_tpu.native.build"""
import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent


def main() -> int:
    src = HERE / "audio.cc"
    out = HERE / "libwhisper_tpu_native.so"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", str(out), str(src)]
    print(" ".join(cmd))
    rc = subprocess.run(cmd).returncode
    if rc == 0:
        print(f"built {out}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
