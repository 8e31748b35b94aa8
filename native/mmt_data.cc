// Native data-loading core: TFRecord framing + tf.train.Example parsing.
//
// The reference delegated its input hot loop to TensorFlow's C++ kernels
// (tf.data + tf.io.parse_single_example; see SURVEY section 2.4).  This
// library is the framework's native equivalent: a buffered TFRecord
// reader with CRC32C verification and a minimal protobuf wire-format
// parser for tf.train.Example, exposed through a C ABI consumed via
// ctypes (no pybind11 dependency).
//
// Wire format facts (stable, public):
//   frame: uint64 length | uint32 masked_crc(length) | payload |
//          uint32 masked_crc(payload);  masked = rotr(crc,15)+0xa282ead8
//   Example = { features(1): Features }, Features = { feature(1):
//   map<string, Feature> }, entry = { key(1), value(2) },
//   Feature = oneof { bytes_list(1), float_list(2), int64_list(3) },
//   each list = repeated field 1 (packed or unpacked).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

namespace {

// ----------------------------------------------------------- crc32c

uint32_t kCrcTable[256];
bool InitCrcTable() {
  for (uint32_t n = 0; n < 256; n++) {
    uint32_t c = n;
    for (int i = 0; i < 8; i++) c = (c & 1) ? (c >> 1) ^ 0x82F63B78u : c >> 1;
    kCrcTable[n] = c;
  }
  return true;
}
const bool kCrcInit = InitCrcTable();

uint32_t Crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; i++) crc = kCrcTable[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t MaskedCrc(const uint8_t* data, size_t n) {
  uint32_t crc = Crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// ----------------------------------------------------------- varint

bool ReadVarint(const uint8_t* buf, size_t len, size_t* pos, uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (*pos < len && shift < 64) {
    uint8_t b = buf[(*pos)++];
    result |= uint64_t(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
  }
  return false;
}

bool SkipField(const uint8_t* buf, size_t len, size_t* pos, uint32_t wire) {
  uint64_t tmp;
  switch (wire) {
    case 0: return ReadVarint(buf, len, pos, &tmp);
    case 1: *pos += 8; return *pos <= len;
    case 2:
      if (!ReadVarint(buf, len, pos, &tmp)) return false;
      *pos += tmp;
      return *pos <= len;
    case 5: *pos += 4; return *pos <= len;
    default: return false;
  }
}

struct Slice {
  const uint8_t* data;
  size_t len;
};

// Finds the Feature submessage for `key` inside an Example payload.
bool FindFeature(const uint8_t* ex, size_t ex_len, const char* key,
                 Slice* feature_out) {
  size_t key_len = strlen(key);
  size_t pos = 0;
  while (pos < ex_len) {
    uint64_t tag;
    if (!ReadVarint(ex, ex_len, &pos, &tag)) return false;
    if ((tag >> 3) != 1 || (tag & 7) != 2) {
      if (!SkipField(ex, ex_len, &pos, tag & 7)) return false;
      continue;
    }
    uint64_t fsize;
    if (!ReadVarint(ex, ex_len, &pos, &fsize)) return false;
    const uint8_t* feats = ex + pos;
    size_t fpos = 0;
    pos += fsize;
    while (fpos < fsize) {
      uint64_t ftag;
      if (!ReadVarint(feats, fsize, &fpos, &ftag)) return false;
      if ((ftag >> 3) != 1 || (ftag & 7) != 2) {
        if (!SkipField(feats, fsize, &fpos, ftag & 7)) return false;
        continue;
      }
      uint64_t esize;
      if (!ReadVarint(feats, fsize, &fpos, &esize)) return false;
      const uint8_t* entry = feats + fpos;
      fpos += esize;
      // entry = { key(1): string, value(2): Feature }
      size_t p = 0;
      Slice k{nullptr, 0}, v{nullptr, 0};
      while (p < esize) {
        uint64_t etag;
        if (!ReadVarint(entry, esize, &p, &etag)) return false;
        uint64_t ln;
        if ((etag & 7) != 2) {
          if (!SkipField(entry, esize, &p, etag & 7)) return false;
          continue;
        }
        if (!ReadVarint(entry, esize, &p, &ln)) return false;
        if ((etag >> 3) == 1) k = {entry + p, (size_t)ln};
        else if ((etag >> 3) == 2) v = {entry + p, (size_t)ln};
        p += ln;
      }
      if (k.len == key_len && memcmp(k.data, key, key_len) == 0) {
        *feature_out = v;
        return true;
      }
    }
  }
  return false;
}

}  // namespace

extern "C" {

// ------------------------------------------------------ TFRecord reader

struct MmtTfrecordReader {
  FILE* f;
  std::vector<uint8_t> buf;
  int check_crc;
  char err[256];
};

MmtTfrecordReader* mmt_tfrecord_open(const char* path, int check_crc) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  auto* r = new MmtTfrecordReader();
  r->f = f;
  r->check_crc = check_crc;
  r->err[0] = 0;
  // Large stdio buffer: sequential streaming workload.
  setvbuf(f, nullptr, _IOFBF, 1 << 20);
  return r;
}

// Returns payload length, 0 on EOF, -1 on error.  The payload pointer is
// valid until the next call.
int64_t mmt_tfrecord_next(MmtTfrecordReader* r, const uint8_t** payload) {
  uint8_t header[8], crcbuf[4];
  size_t n = fread(header, 1, 8, r->f);
  if (n == 0) return 0;
  if (n < 8) {
    snprintf(r->err, sizeof(r->err), "truncated header");
    return -1;
  }
  uint64_t length;
  memcpy(&length, header, 8);  // little-endian hosts only (x86/arm)
  if (fread(crcbuf, 1, 4, r->f) != 4) {
    snprintf(r->err, sizeof(r->err), "truncated header crc");
    return -1;
  }
  if (r->check_crc) {
    uint32_t expect;
    memcpy(&expect, crcbuf, 4);
    if (MaskedCrc(header, 8) != expect) {
      snprintf(r->err, sizeof(r->err), "header crc mismatch");
      return -1;
    }
  }
  r->buf.resize(length);
  if (length && fread(r->buf.data(), 1, length, r->f) != length) {
    snprintf(r->err, sizeof(r->err), "truncated payload");
    return -1;
  }
  if (fread(crcbuf, 1, 4, r->f) != 4) {
    snprintf(r->err, sizeof(r->err), "truncated payload crc");
    return -1;
  }
  if (r->check_crc) {
    uint32_t expect;
    memcpy(&expect, crcbuf, 4);
    if (MaskedCrc(r->buf.data(), length) != expect) {
      snprintf(r->err, sizeof(r->err), "payload crc mismatch");
      return -1;
    }
  }
  *payload = r->buf.data();
  return (int64_t)length;
}

const char* mmt_tfrecord_error(MmtTfrecordReader* r) { return r->err; }

void mmt_tfrecord_close(MmtTfrecordReader* r) {
  if (r) {
    fclose(r->f);
    delete r;
  }
}

// ------------------------------------------------------ Example parsing

// Bytes feature: returns count; fills (ptrs, lens) up to max_out entries.
int64_t mmt_example_bytes_feature(const uint8_t* ex, int64_t ex_len,
                                  const char* key, const uint8_t** ptrs,
                                  int64_t* lens, int64_t max_out) {
  Slice feat;
  if (!FindFeature(ex, ex_len, key, &feat)) return -1;
  size_t pos = 0;
  int64_t count = 0;
  while (pos < feat.len) {
    uint64_t tag;
    if (!ReadVarint(feat.data, feat.len, &pos, &tag)) return -1;
    if ((tag >> 3) != 1 || (tag & 7) != 2) {  // not bytes_list
      if (!SkipField(feat.data, feat.len, &pos, tag & 7)) return -1;
      continue;
    }
    uint64_t bsize;
    if (!ReadVarint(feat.data, feat.len, &pos, &bsize)) return -1;
    const uint8_t* body = feat.data + pos;
    size_t bpos = 0;
    pos += bsize;
    while (bpos < bsize) {
      uint64_t btag;
      if (!ReadVarint(body, bsize, &bpos, &btag)) return -1;
      if ((btag >> 3) == 1 && (btag & 7) == 2) {
        uint64_t ln;
        if (!ReadVarint(body, bsize, &bpos, &ln)) return -1;
        if (count < max_out) {
          ptrs[count] = body + bpos;
          lens[count] = (int64_t)ln;
        }
        count++;
        bpos += ln;
      } else if (!SkipField(body, bsize, &bpos, btag & 7)) {
        return -1;
      }
    }
  }
  return count;
}

// Int64 feature: returns count; fills out up to max_out values.
int64_t mmt_example_int64_feature(const uint8_t* ex, int64_t ex_len,
                                  const char* key, int64_t* out,
                                  int64_t max_out) {
  Slice feat;
  if (!FindFeature(ex, ex_len, key, &feat)) return -1;
  size_t pos = 0;
  int64_t count = 0;
  while (pos < feat.len) {
    uint64_t tag;
    if (!ReadVarint(feat.data, feat.len, &pos, &tag)) return -1;
    if ((tag >> 3) != 3 || (tag & 7) != 2) {  // not int64_list
      if (!SkipField(feat.data, feat.len, &pos, tag & 7)) return -1;
      continue;
    }
    uint64_t bsize;
    if (!ReadVarint(feat.data, feat.len, &pos, &bsize)) return -1;
    const uint8_t* body = feat.data + pos;
    size_t bpos = 0;
    pos += bsize;
    while (bpos < bsize) {
      uint64_t btag;
      if (!ReadVarint(body, bsize, &bpos, &btag)) return -1;
      if ((btag >> 3) == 1 && (btag & 7) == 2) {  // packed
        uint64_t ln;
        if (!ReadVarint(body, bsize, &bpos, &ln)) return -1;
        size_t end = bpos + ln;
        while (bpos < end) {
          uint64_t val;
          if (!ReadVarint(body, bsize, &bpos, &val)) return -1;
          if (count < max_out) out[count] = (int64_t)val;
          count++;
        }
      } else if ((btag >> 3) == 1 && (btag & 7) == 0) {  // unpacked
        uint64_t val;
        if (!ReadVarint(body, bsize, &bpos, &val)) return -1;
        if (count < max_out) out[count] = (int64_t)val;
        count++;
      } else if (!SkipField(body, bsize, &bpos, btag & 7)) {
        return -1;
      }
    }
  }
  return count;
}

// Float feature: returns count; fills out up to max_out values.
int64_t mmt_example_float_feature(const uint8_t* ex, int64_t ex_len,
                                  const char* key, float* out,
                                  int64_t max_out) {
  Slice feat;
  if (!FindFeature(ex, ex_len, key, &feat)) return -1;
  size_t pos = 0;
  int64_t count = 0;
  while (pos < feat.len) {
    uint64_t tag;
    if (!ReadVarint(feat.data, feat.len, &pos, &tag)) return -1;
    if ((tag >> 3) != 2 || (tag & 7) != 2) {  // not float_list
      if (!SkipField(feat.data, feat.len, &pos, tag & 7)) return -1;
      continue;
    }
    uint64_t bsize;
    if (!ReadVarint(feat.data, feat.len, &pos, &bsize)) return -1;
    const uint8_t* body = feat.data + pos;
    size_t bpos = 0;
    pos += bsize;
    while (bpos < bsize) {
      uint64_t btag;
      if (!ReadVarint(body, bsize, &bpos, &btag)) return -1;
      if ((btag >> 3) == 1 && (btag & 7) == 2) {  // packed
        uint64_t ln;
        if (!ReadVarint(body, bsize, &bpos, &ln)) return -1;
        size_t nvals = ln / 4;
        for (size_t i = 0; i < nvals; i++) {
          if (count < max_out) memcpy(&out[count], body + bpos + i * 4, 4);
          count++;
        }
        bpos += ln;
      } else if ((btag >> 3) == 1 && (btag & 7) == 5) {  // unpacked
        if (count < max_out) memcpy(&out[count], body + bpos, 4);
        count++;
        bpos += 4;
      } else if (!SkipField(body, bsize, &bpos, btag & 7)) {
        return -1;
      }
    }
  }
  return count;
}

}  // extern "C"
