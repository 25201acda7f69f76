// vidmeta — native annotation/index scanner for the VID data pipeline.
//
// The reference framework leans on torch's C++ DataLoader workers plus
// per-frame ElementTree XML parsing on the Python side
// (/root/reference/mmdet/datasets/custom.py:164-214, imagenet_vid_sequence.py
// :402-425).  Here the hot metadata path (one XML per frame over ~176k VID
// val frames for evaluation GT, plus the imageset scans) is a small C++
// library: mmap-free buffered reads and a linear tag scanner, exposed via a
// C ABI for ctypes.  A pure-Python fallback stays in vid_dataset.py.
//
// Build: native/build.sh  (g++ -O3 -shared -fPIC)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

std::unordered_map<std::string, int> g_class_to_index;

bool read_file(const char* path, std::string& out) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return false;
    std::fseek(f, 0, SEEK_END);
    long n = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    out.resize(static_cast<size_t>(n));
    size_t got = std::fread(out.data(), 1, static_cast<size_t>(n), f);
    std::fclose(f);
    out.resize(got);
    return true;
}

// find the integer content of <tag>...</tag> starting at `pos`; returns the
// value and advances pos past the close tag, or returns false.
bool find_int(const std::string& s, size_t& pos, const char* open,
              const char* close, long& value) {
    size_t a = s.find(open, pos);
    if (a == std::string::npos) return false;
    a += std::strlen(open);
    size_t b = s.find(close, a);
    if (b == std::string::npos) return false;
    value = std::strtol(s.c_str() + a, nullptr, 10);
    pos = b + std::strlen(close);
    return true;
}

bool find_text(const std::string& s, size_t& pos, const char* open,
               const char* close, std::string& value) {
    size_t a = s.find(open, pos);
    if (a == std::string::npos) return false;
    a += std::strlen(open);
    size_t b = s.find(close, a);
    if (b == std::string::npos) return false;
    value.assign(s, a, b - a);
    // trim whitespace
    size_t i = value.find_first_not_of(" \t\r\n");
    size_t j = value.find_last_not_of(" \t\r\n");
    if (i == std::string::npos) value.clear();
    else value = value.substr(i, j - i + 1);
    pos = b + std::strlen(close);
    return true;
}

}  // namespace

extern "C" {

// Register the wordnet-id class table ('\n'-separated, 1-based labels).
void vidmeta_set_classes(const char* names) {
    g_class_to_index.clear();
    std::string all(names);
    size_t start = 0;
    int idx = 1;
    while (start < all.size()) {
        size_t end = all.find('\n', start);
        if (end == std::string::npos) end = all.size();
        std::string name = all.substr(start, end - start);
        if (!name.empty()) g_class_to_index[name] = idx++;
        start = end + 1;
    }
}

// Parse one VOC/VID XML.  Writes up to max_n objects as
// (xmin, ymin, xmax, ymax, label) int32 rows into out (raw XML ints; the
// Python side applies the −1 offset).  wh receives {width, height}.
// Returns the number of objects found, or −1 on IO error.
int vidmeta_parse_xml(const char* path, int* out, int max_n, int* wh) {
    std::string s;
    if (!read_file(path, s)) return -1;
    size_t pos = 0;
    long w = 0, h = 0;
    size_t size_pos = s.find("<size>");
    if (size_pos != std::string::npos) {
        size_t p = size_pos;
        find_int(s, p, "<width>", "</width>", w);
        p = size_pos;
        find_int(s, p, "<height>", "</height>", h);
    }
    wh[0] = static_cast<int>(w);
    wh[1] = static_cast<int>(h);

    int n = 0;
    pos = 0;
    while (n < max_n) {
        size_t obj = s.find("<object>", pos);
        if (obj == std::string::npos) break;
        size_t obj_end = s.find("</object>", obj);
        if (obj_end == std::string::npos) break;
        size_t p = obj;
        std::string name;
        long x1 = 0, y1 = 0, x2 = 0, y2 = 0;
        bool ok = find_text(s, p, "<name>", "</name>", name);
        size_t q = obj;
        ok = ok && find_int(s, q, "<xmin>", "</xmin>", x1);
        q = obj;
        ok = ok && find_int(s, q, "<ymin>", "</ymin>", y1);
        q = obj;
        ok = ok && find_int(s, q, "<xmax>", "</xmax>", x2);
        q = obj;
        ok = ok && find_int(s, q, "<ymax>", "</ymax>", y2);
        if (ok) {
            auto it = g_class_to_index.find(name);
            if (it != g_class_to_index.end()) {
                out[n * 5 + 0] = static_cast<int>(x1);
                out[n * 5 + 1] = static_cast<int>(y1);
                out[n * 5 + 2] = static_cast<int>(x2);
                out[n * 5 + 3] = static_cast<int>(y2);
                out[n * 5 + 4] = it->second;
                ++n;
            }
        }
        pos = obj_end + 9;
    }
    return n;
}

// Count <object> entries without extracting boxes (used by the imageset
// scanner in load_annotations).
int vidmeta_count_objects(const char* path, int* wh) {
    std::string s;
    if (!read_file(path, s)) return -1;
    long w = 0, h = 0;
    size_t p = s.find("<size>");
    if (p != std::string::npos) {
        size_t q = p;
        find_int(s, q, "<width>", "</width>", w);
        q = p;
        find_int(s, q, "<height>", "</height>", h);
    }
    wh[0] = static_cast<int>(w);
    wh[1] = static_cast<int>(h);
    int n = 0;
    size_t pos = 0;
    while (true) {
        pos = s.find("<object>", pos);
        if (pos == std::string::npos) break;
        ++n;
        pos += 8;
    }
    return n;
}

}  // extern "C"
