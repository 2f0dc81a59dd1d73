// Native safetensors reader: mmap the file, parse the JSON header, hand
// Python zero-copy tensor views (plain C ABI for ctypes; no pybind11 in the
// image). TPU-native analog of the reference's rust safetensors loading
// (ref: fastdm/model/basemodel.py load path via the safetensors package).
//
// Format (safetensors spec): 8-byte little-endian header length N, then N
// bytes of JSON mapping tensor name -> {"dtype": str, "shape": [..],
// "data_offsets": [begin, end]} (offsets relative to the data section that
// follows the header), plus an optional "__metadata__" object.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct Entry {
  std::string name;
  std::string dtype;
  std::vector<int64_t> shape;
  int64_t begin = 0;
  int64_t end = 0;
};

struct StFile {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t size = 0;
  size_t data_base = 0;
  std::vector<Entry> entries;
};

thread_local std::string g_error;

// ---- minimal JSON scanner for the (restricted) safetensors header ----

struct Parser {
  const char* p;
  const char* end;

  bool fail(const char* msg) {
    g_error = std::string("safetensors header parse error: ") + msg;
    return false;
  }
  void ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) p++;
  }
  bool expect(char c) {
    ws();
    if (p >= end || *p != c) return fail("unexpected character");
    p++;
    return true;
  }
  bool peek(char c) {
    ws();
    return p < end && *p == c;
  }
  bool string(std::string* out) {
    ws();
    if (p >= end || *p != '"') return fail("expected string");
    p++;
    out->clear();
    while (p < end && *p != '"') {
      char c = *p++;
      if (c == '\\') {
        if (p >= end) return fail("bad escape");
        char e = *p++;
        switch (e) {
          case '"': out->push_back('"'); break;
          case '\\': out->push_back('\\'); break;
          case '/': out->push_back('/'); break;
          case 'n': out->push_back('\n'); break;
          case 't': out->push_back('\t'); break;
          case 'r': out->push_back('\r'); break;
          case 'b': out->push_back('\b'); break;
          case 'f': out->push_back('\f'); break;
          case 'u': {
            if (end - p < 4) return fail("bad \\u escape");
            unsigned v = 0;
            for (int i = 0; i < 4; i++) {
              char h = *p++;
              v <<= 4;
              if (h >= '0' && h <= '9') v |= h - '0';
              else if (h >= 'a' && h <= 'f') v |= h - 'a' + 10;
              else if (h >= 'A' && h <= 'F') v |= h - 'A' + 10;
              else return fail("bad \\u escape");
            }
            // tensor names are ASCII in practice; encode BMP as UTF-8
            if (v < 0x80) out->push_back(char(v));
            else if (v < 0x800) {
              out->push_back(char(0xC0 | (v >> 6)));
              out->push_back(char(0x80 | (v & 0x3F)));
            } else {
              out->push_back(char(0xE0 | (v >> 12)));
              out->push_back(char(0x80 | ((v >> 6) & 0x3F)));
              out->push_back(char(0x80 | (v & 0x3F)));
            }
            break;
          }
          default: return fail("unknown escape");
        }
      } else {
        out->push_back(c);
      }
    }
    if (p >= end) return fail("unterminated string");
    p++;  // closing quote
    return true;
  }
  bool integer(int64_t* out) {
    ws();
    bool neg = false;
    if (p < end && *p == '-') { neg = true; p++; }
    if (p >= end || *p < '0' || *p > '9') return fail("expected integer");
    int64_t v = 0;
    while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
    *out = neg ? -v : v;
    return true;
  }
  // skip any JSON value (for __metadata__)
  bool skip() {
    ws();
    if (p >= end) return fail("eof");
    char c = *p;
    if (c == '"') { std::string s; return string(&s); }
    if (c == '{') {
      p++;
      if (peek('}')) { p++; return true; }
      while (true) {
        std::string k;
        if (!string(&k) || !expect(':') || !skip()) return false;
        ws();
        if (p < end && *p == ',') { p++; continue; }
        return expect('}');
      }
    }
    if (c == '[') {
      p++;
      if (peek(']')) { p++; return true; }
      while (true) {
        if (!skip()) return false;
        ws();
        if (p < end && *p == ',') { p++; continue; }
        return expect(']');
      }
    }
    // number / true / false / null
    while (p < end && *p != ',' && *p != '}' && *p != ']' &&
           *p != ' ' && *p != '\n' && *p != '\t' && *p != '\r') p++;
    return true;
  }

  bool entry_body(Entry* e) {
    if (!expect('{')) return false;
    if (peek('}')) { p++; return true; }
    while (true) {
      std::string key;
      if (!string(&key) || !expect(':')) return false;
      if (key == "dtype") {
        if (!string(&e->dtype)) return false;
      } else if (key == "shape") {
        if (!expect('[')) return false;
        if (peek(']')) { p++; }
        else {
          while (true) {
            int64_t v;
            if (!integer(&v)) return false;
            e->shape.push_back(v);
            ws();
            if (p < end && *p == ',') { p++; continue; }
            if (!expect(']')) return false;
            break;
          }
        }
      } else if (key == "data_offsets") {
        if (!expect('[') || !integer(&e->begin)) return false;
        ws();
        if (!expect(',') || !integer(&e->end) || !expect(']')) return false;
      } else {
        if (!skip()) return false;
      }
      ws();
      if (p < end && *p == ',') { p++; continue; }
      return expect('}');
    }
  }

  bool header(std::vector<Entry>* out) {
    if (!expect('{')) return false;
    if (peek('}')) { p++; return true; }
    while (true) {
      std::string name;
      if (!string(&name) || !expect(':')) return false;
      if (name == "__metadata__") {
        if (!skip()) return false;
      } else {
        Entry e;
        e.name = std::move(name);
        if (!entry_body(&e)) return false;
        out->push_back(std::move(e));
      }
      ws();
      if (p < end && *p == ',') { p++; continue; }
      return expect('}');
    }
  }
};

}  // namespace

extern "C" {

void st_close(void* h);

const char* st_error() { return g_error.c_str(); }

void* st_open(const char* path) {
  g_error.clear();
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) {
    g_error = std::string("open failed: ") + path;
    return nullptr;
  }
  struct stat st;
  if (fstat(fd, &st) != 0 || st.st_size < 8) {
    ::close(fd);
    g_error = "stat failed or file too small";
    return nullptr;
  }
  size_t size = size_t(st.st_size);
  void* map = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    g_error = "mmap failed";
    return nullptr;
  }
  madvise(map, size, MADV_SEQUENTIAL);

  auto* f = new StFile();
  f->fd = fd;
  f->map = static_cast<const uint8_t*>(map);
  f->size = size;

  uint64_t header_len;
  std::memcpy(&header_len, f->map, 8);  // spec: little-endian u64
  if (header_len > size - 8) {
    g_error = "header length exceeds file size";
    st_close(f);
    return nullptr;
  }
  f->data_base = 8 + header_len;

  Parser parser{reinterpret_cast<const char*>(f->map) + 8,
                reinterpret_cast<const char*>(f->map) + 8 + header_len};
  if (!parser.header(&f->entries)) {
    st_close(f);
    return nullptr;
  }
  // validate offsets against the data section
  const int64_t data_len = int64_t(size) - int64_t(f->data_base);
  for (const Entry& e : f->entries) {
    if (e.begin < 0 || e.end < e.begin || e.end > data_len) {
      g_error = "tensor data_offsets out of bounds: " + e.name;
      st_close(f);
      return nullptr;
    }
  }
  return f;
}

void st_close(void* h) {
  auto* f = static_cast<StFile*>(h);
  if (!f) return;
  if (f->map) munmap(const_cast<uint8_t*>(f->map), f->size);
  if (f->fd >= 0) ::close(f->fd);
  delete f;
}

int64_t st_count(void* h) { return int64_t(static_cast<StFile*>(h)->entries.size()); }

const char* st_name(void* h, int64_t i) {
  return static_cast<StFile*>(h)->entries[size_t(i)].name.c_str();
}

const char* st_dtype(void* h, int64_t i) {
  return static_cast<StFile*>(h)->entries[size_t(i)].dtype.c_str();
}

int st_shape(void* h, int64_t i, int64_t* out, int max_ndim) {
  const auto& shape = static_cast<StFile*>(h)->entries[size_t(i)].shape;
  if (int(shape.size()) > max_ndim) return -1;
  for (size_t d = 0; d < shape.size(); d++) out[d] = shape[d];
  return int(shape.size());
}

void st_offsets(void* h, int64_t i, int64_t* begin, int64_t* nbytes) {
  const auto& e = static_cast<StFile*>(h)->entries[size_t(i)];
  *begin = e.begin;
  *nbytes = e.end - e.begin;
}

// base address of the data section (tensor offsets are relative to this)
const uint8_t* st_base(void* h) {
  auto* f = static_cast<StFile*>(h);
  return f->map + f->data_base;
}

// prefetch the whole data section (overlapping readahead with parsing)
void st_prefetch(void* h) {
  auto* f = static_cast<StFile*>(h);
  madvise(const_cast<uint8_t*>(f->map), f->size, MADV_WILLNEED);
}

}  // extern "C"
