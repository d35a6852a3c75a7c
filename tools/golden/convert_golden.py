"""Convert dump_golden.c's binary record stream into a .npz archive."""
import sys

import numpy as np


def main(src, dst):
    arrays = {}
    with open(src, "rb") as f:
        while True:
            header = b""
            while not header.endswith(b"\n"):
                c = f.read(1)
                if not c:
                    break
                header += c
            if not header:
                break
            parts = header.decode().split()
            name, dtype, ndim = parts[0], parts[1], int(parts[2])
            dims = [int(d) for d in parts[3:3 + ndim]]
            count = int(np.prod(dims))
            data = np.frombuffer(f.read(4 * count), dtype="<f4")
            arrays[name] = data.reshape(dims)
    np.savez_compressed(dst, **arrays)
    print(f"{len(arrays)} arrays -> {dst}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
