// Native binvox RLE codec — the hot host-side decode path.
//
// The ShapeNet pipeline decodes ~30k run-length-encoded 32^3 volumes per
// training epoch (reference utils/binvox_rw.py does this with numpy repeat;
// ours in data/binvox.py is vectorized numpy).  This C++ version decodes a
// payload in a single pass with no intermediate allocations and encodes with
// a branch-light run scanner; exposed to Python via ctypes (see runtime.py).
//
// ABI (all plain C, no exceptions across the boundary):
//   voxcodec_decode(payload, payload_len, out, out_len) -> n_written or -1
//     expands <value, count> byte pairs into out as 0/1 bytes.
//   voxcodec_encode(grid, n, out, out_cap) -> bytes_written or -1
//     RLE-encodes a 0/1 byte grid; runs longer than 255 are split.
//   voxcodec_transpose_xzy(src, dst, d): (x, z, y) file order -> (x, y, z).

#include <cstdint>
#include <cstring>

extern "C" {

long voxcodec_decode(const uint8_t* payload, long payload_len,
                     uint8_t* out, long out_cap) {
  if (payload_len % 2 != 0) return -1;
  long pos = 0;
  for (long i = 0; i < payload_len; i += 2) {
    const uint8_t value = payload[i] ? 1 : 0;
    const long count = payload[i + 1];
    if (pos + count > out_cap) return -1;
    std::memset(out + pos, value, static_cast<size_t>(count));
    pos += count;
  }
  return pos;
}

long voxcodec_encode(const uint8_t* grid, long n, uint8_t* out, long out_cap) {
  if (n == 0) return 0;
  long w = 0;
  uint8_t state = grid[0] ? 1 : 0;
  long run = 0;
  for (long i = 0; i < n; ++i) {
    const uint8_t v = grid[i] ? 1 : 0;
    if (v == state) {
      if (++run == 255) {
        if (w + 2 > out_cap) return -1;
        out[w++] = state;
        out[w++] = 255;
        run = 0;
      }
    } else {
      if (run > 0) {
        if (w + 2 > out_cap) return -1;
        out[w++] = state;
        out[w++] = static_cast<uint8_t>(run);
      }
      state = v;
      run = 1;
    }
  }
  if (run > 0) {
    if (w + 2 > out_cap) return -1;
    out[w++] = state;
    out[w++] = static_cast<uint8_t>(run);
  }
  return w;
}

void voxcodec_transpose_xzy(const uint8_t* src, uint8_t* dst, long d) {
  // src laid out as [x][z][y]; dst as [x][y][z]
  for (long x = 0; x < d; ++x) {
    const uint8_t* sx = src + x * d * d;
    uint8_t* dx = dst + x * d * d;
    for (long z = 0; z < d; ++z) {
      const uint8_t* sz = sx + z * d;
      for (long y = 0; y < d; ++y) {
        dx[y * d + z] = sz[y];
      }
    }
  }
}

}  // extern "C"
