// Native recordio runtime: CRC32C (slice-by-8) + TFRecord file scanning.
//
// The reference framework has no native code at all (SURVEY §0); this library
// is the TPU build's host-side data runtime: it takes record framing,
// checksumming and bulk file scanning off the Python hot path so the input
// pipeline can keep the chip fed. Exposed via a plain C ABI consumed with
// ctypes (tpurec/data/crc32c.py, tpurec/data/native.py).
//
// Build: make -C cpp   (produces librecordio.so)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kPoly = 0x82F63B78u;  // reflected Castagnoli
constexpr uint32_t kMaskDelta = 0xA282EAD8u;

struct Crc32cTables {
  uint32_t t[8][256];
  Crc32cTables() {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t crc = i;
      for (int k = 0; k < 8; ++k) crc = (crc >> 1) ^ ((crc & 1) ? kPoly : 0);
      t[0][i] = crc;
    }
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t crc = t[0][i];
      for (int s = 1; s < 8; ++s) {
        crc = (crc >> 8) ^ t[0][crc & 0xFF];
        t[s][i] = crc;
      }
    }
  }
};

const Crc32cTables kTables;

inline uint32_t Crc32cImpl(const char* data, size_t n, uint32_t crc) {
  const auto& t = kTables.t;
  crc = ~crc;
  const unsigned char* p = reinterpret_cast<const unsigned char*>(data);
  // slice-by-8
  while (n >= 8) {
    uint64_t word;
    memcpy(&word, p, 8);
    word ^= crc;
    crc = t[7][word & 0xFF] ^ t[6][(word >> 8) & 0xFF] ^
          t[5][(word >> 16) & 0xFF] ^ t[4][(word >> 24) & 0xFF] ^
          t[3][(word >> 32) & 0xFF] ^ t[2][(word >> 40) & 0xFF] ^
          t[1][(word >> 48) & 0xFF] ^ t[0][(word >> 56) & 0xFF];
    p += 8;
    n -= 8;
  }
  while (n--) crc = (crc >> 8) ^ t[0][(crc ^ *p++) & 0xFF];
  return ~crc;
}

inline uint32_t MaskedCrc(const char* data, size_t n) {
  uint32_t crc = Crc32cImpl(data, n, 0);
  return ((crc >> 15) | (crc << 17)) + kMaskDelta;
}

}  // namespace

extern "C" {

uint32_t crc32c(const char* data, size_t n) { return Crc32cImpl(data, n, 0); }

uint32_t crc32c_extend(uint32_t crc, const char* data, size_t n) {
  return Crc32cImpl(data, n, crc);
}

// Scan a TFRecord file; fill (offset, length) of each record payload.
// Returns record count, or -1 on I/O error / corruption, or -2 if capacity
// was insufficient (call again with a larger buffer).
long tfrecord_index(const char* path, long* offsets, long* lengths,
                    long capacity) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  long count = 0;
  unsigned char header[12];
  for (;;) {
    size_t got = fread(header, 1, 12, f);
    if (got == 0) break;
    if (got < 12) { fclose(f); return -1; }
    uint64_t len;
    memcpy(&len, header, 8);
    long offset = ftell(f);
    if (fseek(f, static_cast<long>(len) + 4, SEEK_CUR) != 0) {
      fclose(f);
      return -1;
    }
    if (count >= capacity) { fclose(f); return -2; }
    offsets[count] = offset;
    lengths[count] = static_cast<long>(len);
    ++count;
  }
  fclose(f);
  return count;
}

// Read every record payload into one contiguous buffer, optionally verifying
// CRCs. offsets[i]/lengths[i] describe payload i inside buf. Returns total
// payload bytes, -1 on error/corruption, -2 on insufficient capacity.
long tfrecord_read_all(const char* path, char* buf, long buf_capacity,
                       long* offsets, long* lengths, long capacity,
                       int verify) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  long count = 0;
  long total = 0;
  unsigned char header[12];
  std::vector<char> tmp;
  for (;;) {
    size_t got = fread(header, 1, 12, f);
    if (got == 0) break;
    if (got < 12) { fclose(f); return -1; }
    uint64_t len;
    memcpy(&len, header, 8);
    if (verify) {
      uint32_t expect;
      memcpy(&expect, header + 8, 4);
      if (MaskedCrc(reinterpret_cast<char*>(header), 8) != expect) {
        fclose(f);
        return -1;
      }
    }
    if (count >= capacity || total + static_cast<long>(len) > buf_capacity) {
      fclose(f);
      return -2;
    }
    if (fread(buf + total, 1, len, f) != len) { fclose(f); return -1; }
    uint32_t dcrc;
    if (fread(&dcrc, 1, 4, f) != 4) { fclose(f); return -1; }
    if (verify && MaskedCrc(buf + total, len) != dcrc) {
      fclose(f);
      return -1;
    }
    offsets[count] = total;
    lengths[count] = static_cast<long>(len);
    total += static_cast<long>(len);
    ++count;
  }
  fclose(f);
  // record count goes in offsets[capacity-1]? No — return via lengths sentinel
  // not needed: caller re-derives count by scanning lengths; instead we store
  // count in offsets beyond data? Keep it simple: caller uses tfrecord_index
  // for the count first, or reads until lengths[i]==-1.
  if (count < capacity) lengths[count] = -1;  // sentinel
  return total;
}

}  // extern "C"
