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

// ---------------------------------------------------------------------------
// Columnar tf.train.Example decoding.
//
// Parses the protobuf wire format of Example directly (no protobuf library):
//   Example { 1: Features { 1: repeated MapEntry { 1: key, 2: Feature } } }
//   Feature { 1: BytesList, 2: FloatList{1: packed f32}, 3: Int64List{1: packed varint} }
// For a fixed schema (feature name, kind, width) the decoder fills
// preallocated columnar arrays — the bulk path behind tpurec/data/loader.py.

namespace {

inline bool ReadVarint(const uint8_t*& p, const uint8_t* end, uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (p < end) {
    uint8_t b = *p++;
    result |= static_cast<uint64_t>(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
    if (shift >= 64) return false;
  }
  return false;
}

struct FeatureSpec {
  const char* name;
  size_t name_len;
  int kind;    // 0 = int64, 1 = float32
  long width;  // values per record
  void* out;   // int64_t* or float*
};

// Decode one Feature payload into out row; returns false on schema mismatch.
bool DecodeFeature(const uint8_t* p, const uint8_t* end, const FeatureSpec& spec,
                   long row) {
  uint64_t tag;
  if (!ReadVarint(p, end, &tag)) return false;
  uint64_t field = tag >> 3;
  uint64_t len;
  if (!ReadVarint(p, end, &len)) return false;
  const uint8_t* payload = p;
  const uint8_t* pend = p + len;
  if (pend > end) return false;
  if (field == 3 && spec.kind == 0) {  // Int64List
    // inner: field 1 packed varints (or repeated unpacked)
    int64_t* dst = static_cast<int64_t*>(spec.out) + row * spec.width;
    long count = 0;
    const uint8_t* q = payload;
    while (q < pend) {
      uint64_t itag;
      if (!ReadVarint(q, pend, &itag)) return false;
      if ((itag >> 3) != 1) return false;
      if ((itag & 7) == 2) {  // packed
        uint64_t plen;
        if (!ReadVarint(q, pend, &plen)) return false;
        const uint8_t* vend = q + plen;
        while (q < vend) {
          uint64_t v;
          if (!ReadVarint(q, vend, &v)) return false;
          if (count < spec.width) dst[count] = static_cast<int64_t>(v);
          ++count;
        }
      } else {  // unpacked varint
        uint64_t v;
        if (!ReadVarint(q, pend, &v)) return false;
        if (count < spec.width) dst[count] = static_cast<int64_t>(v);
        ++count;
      }
    }
    // pad short lists with zeros
    for (; count < spec.width; ++count) dst[count] = 0;
    return true;
  }
  if (field == 2 && spec.kind == 1) {  // FloatList
    float* dst = static_cast<float*>(spec.out) + row * spec.width;
    long count = 0;
    const uint8_t* q = payload;
    while (q < pend) {
      uint64_t itag;
      if (!ReadVarint(q, pend, &itag)) return false;
      if ((itag >> 3) != 1) return false;
      if ((itag & 7) == 2) {
        uint64_t plen;
        if (!ReadVarint(q, pend, &plen)) return false;
        long n = static_cast<long>(plen / 4);
        for (long i = 0; i < n; ++i) {
          float v;
          memcpy(&v, q + i * 4, 4);
          if (count < spec.width) dst[count] = v;
          ++count;
        }
        q += plen;
      } else if ((itag & 7) == 5) {
        float v;
        memcpy(&v, q, 4);
        q += 4;
        if (count < spec.width) dst[count] = v;
        ++count;
      } else {
        return false;
      }
    }
    for (; count < spec.width; ++count) dst[count] = 0.0f;
    return true;
  }
  return false;  // bytes or kind mismatch
}

}  // namespace

extern "C" {

// Returns number of records decoded, or -1 (I/O / parse error), -2 (capacity).
long tfrecord_decode_columnar(const char* path, const char* names,
                              const int* kinds, const long* widths,
                              long n_features, void** outputs,
                              long capacity_records, int verify) {
  // build specs
  std::vector<FeatureSpec> specs(n_features);
  const char* np = names;
  for (long i = 0; i < n_features; ++i) {
    specs[i] = {np, strlen(np), kinds[i], widths[i], outputs[i]};
    np += specs[i].name_len + 1;
  }
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  std::vector<char> buf;
  unsigned char header[12];
  long row = 0;
  for (;;) {
    size_t got = fread(header, 1, 12, f);
    if (got == 0) break;
    if (got < 12) { fclose(f); return -1; }
    uint64_t len;
    memcpy(&len, header, 8);
    buf.resize(len);
    if (fread(buf.data(), 1, len, f) != len) { fclose(f); return -1; }
    uint32_t dcrc;
    if (fread(&dcrc, 1, 4, f) != 4) { fclose(f); return -1; }
    if (verify && MaskedCrc(buf.data(), len) != dcrc) { fclose(f); return -1; }
    if (row >= capacity_records) { fclose(f); return -2; }
    // parse Example
    const uint8_t* p = reinterpret_cast<const uint8_t*>(buf.data());
    const uint8_t* end = p + len;
    long found = 0;
    while (p < end) {
      uint64_t tag;
      if (!ReadVarint(p, end, &tag)) { fclose(f); return -1; }
      uint64_t flen;
      if (!ReadVarint(p, end, &flen)) { fclose(f); return -1; }
      const uint8_t* fend = p + flen;
      if ((tag >> 3) == 1) {  // Features
        const uint8_t* q = p;
        while (q < fend) {
          uint64_t etag;
          if (!ReadVarint(q, fend, &etag)) { fclose(f); return -1; }
          uint64_t elen;
          if (!ReadVarint(q, fend, &elen)) { fclose(f); return -1; }
          const uint8_t* eend = q + elen;
          if ((etag >> 3) == 1) {  // MapEntry
            const uint8_t* key = nullptr;
            size_t key_len = 0;
            const uint8_t* val = nullptr;
            size_t val_len = 0;
            const uint8_t* m = q;
            while (m < eend) {
              uint64_t mtag;
              if (!ReadVarint(m, eend, &mtag)) { fclose(f); return -1; }
              uint64_t mlen;
              if (!ReadVarint(m, eend, &mlen)) { fclose(f); return -1; }
              if ((mtag >> 3) == 1) { key = m; key_len = mlen; }
              else if ((mtag >> 3) == 2) { val = m; val_len = mlen; }
              m += mlen;
            }
            if (key && val) {
              for (auto& spec : specs) {
                if (spec.name_len == key_len &&
                    memcmp(spec.name, key, key_len) == 0) {
                  if (!DecodeFeature(val, val + val_len, spec, row)) {
                    fclose(f);
                    return -1;
                  }
                  ++found;
                  break;
                }
              }
            }
          }
          q = eend;
        }
      }
      p = fend;
    }
    if (found != n_features) { fclose(f); return -3; }  // missing feature
    ++row;
  }
  fclose(f);
  return row;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Columnar tf.train.Example ENCODING: the write-side counterpart of the
// decoder above. Serializes N records of a fixed (name, kind, width) schema
// from columnar arrays straight into a framed TFRecord file — takes the
// DataGenerators' per-row python encode loop off the hot path.

namespace {

inline void AppendVarint(std::vector<uint8_t>& out, uint64_t v) {
  while (v >= 0x80) {
    out.push_back(static_cast<uint8_t>(v) | 0x80);
    v >>= 7;
  }
  out.push_back(static_cast<uint8_t>(v));
}

inline void AppendTag(std::vector<uint8_t>& out, uint32_t field, uint32_t wire) {
  AppendVarint(out, (field << 3) | wire);
}

inline void AppendLenDelim(std::vector<uint8_t>& out, uint32_t field,
                           const std::vector<uint8_t>& payload) {
  AppendTag(out, field, 2);
  AppendVarint(out, payload.size());
  out.insert(out.end(), payload.begin(), payload.end());
}

}  // namespace

extern "C" {

// names: "n1\0n2\0..."; kinds: 0=int64 (inputs int64*), 1=float32 (float*).
// widths: values per record. Appends framed records for rows [0, n_records)
// to `path` (truncates unless append != 0). Returns n_records or -1.
long tfrecord_encode_columnar(const char* path, const char* names,
                              const int* kinds, const long* widths,
                              long n_features, const void** inputs,
                              long n_records, int append) {
  struct Spec { const char* name; size_t name_len; int kind; long width; const void* in; };
  std::vector<Spec> specs(n_features);
  const char* np = names;
  for (long i = 0; i < n_features; ++i) {
    specs[i] = {np, strlen(np), kinds[i], widths[i], inputs[i]};
    np += specs[i].name_len + 1;
  }
  FILE* f = fopen(path, append ? "ab" : "wb");
  if (!f) return -1;
  std::vector<uint8_t> feat, entry, features, example, inner;
  for (long row = 0; row < n_records; ++row) {
    features.clear();
    for (auto& spec : specs) {
      // Feature payload
      feat.clear();
      inner.clear();
      if (spec.kind == 0) {
        const int64_t* vals = static_cast<const int64_t*>(spec.in) + row * spec.width;
        std::vector<uint8_t> packed;
        for (long j = 0; j < spec.width; ++j)
          AppendVarint(packed, static_cast<uint64_t>(vals[j]));
        AppendLenDelim(inner, 1, packed);          // Int64List.value (packed)
        AppendLenDelim(feat, 3, inner);            // Feature.int64_list
      } else {
        const float* vals = static_cast<const float*>(spec.in) + row * spec.width;
        std::vector<uint8_t> packed(spec.width * 4);
        memcpy(packed.data(), vals, spec.width * 4);
        AppendLenDelim(inner, 1, packed);          // FloatList.value (packed)
        AppendLenDelim(feat, 2, inner);            // Feature.float_list
      }
      // MapEntry { key=1, value=2 }
      entry.clear();
      AppendTag(entry, 1, 2);
      AppendVarint(entry, spec.name_len);
      entry.insert(entry.end(), spec.name, spec.name + spec.name_len);
      AppendLenDelim(entry, 2, feat);
      AppendLenDelim(features, 1, entry);          // Features.feature
    }
    example.clear();
    AppendLenDelim(example, 1, features);          // Example.features
    // TFRecord frame
    uint64_t len = example.size();
    char header[12];
    memcpy(header, &len, 8);
    uint32_t hcrc = MaskedCrc(header, 8);
    memcpy(header + 8, &hcrc, 4);
    uint32_t dcrc = MaskedCrc(reinterpret_cast<char*>(example.data()), len);
    fwrite(header, 1, 12, f);
    fwrite(example.data(), 1, len, f);
    fwrite(&dcrc, 1, 4, f);
  }
  fclose(f);
  return n_records;
}

}  // extern "C"
