// tructstore — crash-safe in-memory KV store with append-only log persistence.
//
// Native host-side storage for the TPU search engine, replacing the role LMDB
// plays in the reference design (source-of-truth asset store, exact-match
// dupsort databases, metadata). Design goals mirror the reference's
// consistency model (SURVEY §5: LMDB commits per batch; derived device
// indexes are rebuildable):
//
//   - Named sub-databases, two kinds:
//       * plain:   key -> single value (replace on put)
//       * dupsort: key -> sorted set of values (insert/delete individual values)
//   - Ordered keys with prefix range scans (needed for bidirectional
//     ISCC prefix matching).
//   - Durability: every mutation is framed (CRC32) and appended to store.log.
//     A torn tail is truncated on recovery. fsync only on explicit sync()
//     (parity with the reference's sync=False LMDB usage).
//   - Compaction: snapshot rewrite (store.snap) + log truncation, atomic via
//     temp+rename. Open() loads snapshot then replays the log.
//
// Exposed as a C ABI consumed via ctypes (iscc_search_tpu/store/kv.py).
// Thread safety: a std::shared_mutex allows concurrent readers; writers are
// exclusive (the engine additionally serializes writers, mirroring the
// reference's single-writer lock).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <set>
#include <shared_mutex>
#include <string>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

// ---------------------------------------------------------------------------
// CRC32 (standard polynomial, table-driven)
// ---------------------------------------------------------------------------

uint32_t crc32_table[256];
bool crc32_init_done = false;

void crc32_init() {
    if (crc32_init_done) return;
    for (uint32_t i = 0; i < 256; i++) {
        uint32_t c = i;
        for (int k = 0; k < 8; k++) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
        crc32_table[i] = c;
    }
    crc32_init_done = true;
}

uint32_t crc32(const uint8_t* data, size_t len, uint32_t seed = 0) {
    uint32_t c = seed ^ 0xFFFFFFFFu;
    for (size_t i = 0; i < len; i++) c = crc32_table[(c ^ data[i]) & 0xFF] ^ (c >> 8);
    return c ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// Store structures
// ---------------------------------------------------------------------------

using Bytes = std::string;

struct Db {
    bool dupsort = false;
    // plain: value = single-element vector; dupsort: sorted unique values
    std::map<Bytes, std::vector<Bytes>> data;
    size_t entries = 0;  // plain: #keys; dupsort: #(key,value) pairs
    size_t bytes = 0;    // approximate payload bytes
};

enum Op : uint8_t {
    OP_PUT = 1,       // plain put (replace)
    OP_DEL = 2,       // plain delete key
    OP_DUP_PUT = 3,   // dupsort insert value
    OP_DUP_DEL = 4,   // dupsort delete value
    OP_DROP_DB = 5,   // remove a whole sub-db
};

struct Store {
    std::string dir;
    int log_fd = -1;
    std::unordered_map<std::string, Db> dbs;
    mutable std::shared_mutex mtx;
    std::string wbuf;         // pending appends not yet written to the fd
    uint64_t log_bytes = 0;   // current log size
    std::string last_error;
};

// Record framing: [u32 payload_len][payload][u32 crc(payload)]
// payload: [u8 op][u16 db_len][db][u32 key_len][key][u32 val_len][val]

void put_u16(std::string& out, uint16_t v) { out.append(reinterpret_cast<char*>(&v), 2); }
void put_u32(std::string& out, uint32_t v) { out.append(reinterpret_cast<char*>(&v), 4); }

void encode_record(std::string& out, uint8_t op, const std::string& db, const Bytes& key, const Bytes& val) {
    std::string payload;
    payload.reserve(1 + 2 + db.size() + 4 + key.size() + 4 + val.size());
    payload.push_back(static_cast<char>(op));
    put_u16(payload, static_cast<uint16_t>(db.size()));
    payload.append(db);
    put_u32(payload, static_cast<uint32_t>(key.size()));
    payload.append(key);
    put_u32(payload, static_cast<uint32_t>(val.size()));
    payload.append(val);
    put_u32(out, static_cast<uint32_t>(payload.size()));
    out.append(payload);
    put_u32(out, crc32(reinterpret_cast<const uint8_t*>(payload.data()), payload.size()));
}

// Apply a mutation to in-memory state. Returns true if state changed.
bool apply(Store& s, uint8_t op, const std::string& dbname, const Bytes& key, const Bytes& val) {
    if (op == OP_DROP_DB) {
        return s.dbs.erase(dbname) > 0;
    }
    Db& db = s.dbs[dbname];
    switch (op) {
        case OP_PUT: {
            db.dupsort = false;
            auto it = db.data.find(key);
            if (it == db.data.end()) {
                db.data.emplace(key, std::vector<Bytes>{val});
                db.entries += 1;
                db.bytes += key.size() + val.size();
            } else {
                db.bytes += val.size() - it->second[0].size();
                it->second[0] = val;
            }
            return true;
        }
        case OP_DEL: {
            auto it = db.data.find(key);
            if (it == db.data.end()) return false;
            db.bytes -= key.size();
            for (const auto& v : it->second) db.bytes -= v.size();
            db.entries -= db.dupsort ? it->second.size() : 1;
            db.data.erase(it);
            return true;
        }
        case OP_DUP_PUT: {
            db.dupsort = true;
            auto& vec = db.data[key];
            auto pos = std::lower_bound(vec.begin(), vec.end(), val);
            if (pos != vec.end() && *pos == val) return false;  // dupdata=False semantics
            vec.insert(pos, val);
            db.entries += 1;
            db.bytes += (vec.size() == 1 ? key.size() : 0) + val.size();
            return true;
        }
        case OP_DUP_DEL: {
            auto it = db.data.find(key);
            if (it == db.data.end()) return false;
            auto& vec = it->second;
            auto pos = std::lower_bound(vec.begin(), vec.end(), val);
            if (pos == vec.end() || *pos != val) return false;
            vec.erase(pos);
            db.entries -= 1;
            db.bytes -= val.size();
            if (vec.empty()) {
                db.bytes -= key.size();
                db.data.erase(it);
            }
            return true;
        }
        default:
            return false;
    }
}

// Log a mutation (append to write buffer) and apply it.
bool log_and_apply(Store& s, uint8_t op, const std::string& dbname, const Bytes& key, const Bytes& val) {
    bool changed = apply(s, op, dbname, key, val);
    if (changed) encode_record(s.wbuf, op, dbname, key, val);
    return changed;
}

bool flush_wbuf(Store& s) {
    if (s.wbuf.empty()) return true;
    const char* p = s.wbuf.data();
    size_t remaining = s.wbuf.size();
    while (remaining > 0) {
        ssize_t n = ::write(s.log_fd, p, remaining);
        if (n < 0) {
            if (errno == EINTR) continue;
            s.last_error = std::string("log write failed: ") + strerror(errno);
            return false;
        }
        p += n;
        remaining -= static_cast<size_t>(n);
    }
    s.log_bytes += s.wbuf.size();
    s.wbuf.clear();
    return true;
}

// Replay framed records from a buffer; stops cleanly at a torn tail.
// Returns the number of bytes of valid records consumed.
size_t replay(Store& s, const std::string& buf) {
    size_t off = 0;
    while (off + 8 <= buf.size()) {
        uint32_t plen;
        memcpy(&plen, buf.data() + off, 4);
        if (off + 4 + plen + 4 > buf.size()) break;  // torn tail
        const uint8_t* payload = reinterpret_cast<const uint8_t*>(buf.data()) + off + 4;
        uint32_t stored_crc;
        memcpy(&stored_crc, buf.data() + off + 4 + plen, 4);
        if (crc32(payload, plen) != stored_crc) break;  // corrupt tail
        // decode
        size_t p = 0;
        if (plen < 1 + 2 + 4 + 4) break;
        uint8_t op = payload[p];
        p += 1;
        uint16_t dblen;
        memcpy(&dblen, payload + p, 2);
        p += 2;
        if (p + dblen + 4 > plen) break;
        std::string dbname(reinterpret_cast<const char*>(payload + p), dblen);
        p += dblen;
        uint32_t klen;
        memcpy(&klen, payload + p, 4);
        p += 4;
        if (p + klen + 4 > plen) break;
        Bytes key(reinterpret_cast<const char*>(payload + p), klen);
        p += klen;
        uint32_t vlen;
        memcpy(&vlen, payload + p, 4);
        p += 4;
        if (p + vlen != plen) break;
        Bytes val(reinterpret_cast<const char*>(payload + p), vlen);
        apply(s, op, dbname, key, val);
        off += 4 + plen + 4;
    }
    return off;
}

bool read_file(const std::string& path, std::string& out) {
    int fd = ::open(path.c_str(), O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0) {
        ::close(fd);
        return false;
    }
    out.resize(static_cast<size_t>(st.st_size));
    size_t off = 0;
    while (off < out.size()) {
        ssize_t n = ::read(fd, out.data() + off, out.size() - off);
        if (n <= 0) {
            ::close(fd);
            return false;
        }
        off += static_cast<size_t>(n);
    }
    ::close(fd);
    return true;
}

// Snapshot format: same framed records as the log (a full replayable state
// dump), so one decoder serves both files.
bool write_snapshot(Store& s) {
    std::string tmp_path = s.dir + "/store.snap.tmp";
    std::string snap_path = s.dir + "/store.snap";
    std::string buf;
    for (const auto& [dbname, db] : s.dbs) {
        for (const auto& [key, vals] : db.data) {
            if (db.dupsort) {
                for (const auto& v : vals) encode_record(buf, OP_DUP_PUT, dbname, key, v);
            } else {
                encode_record(buf, OP_PUT, dbname, key, vals[0]);
            }
        }
    }
    int fd = ::open(tmp_path.c_str(), O_WRONLY | O_CREAT | O_TRUNC, 0644);
    if (fd < 0) {
        s.last_error = std::string("snapshot open failed: ") + strerror(errno);
        return false;
    }
    size_t off = 0;
    while (off < buf.size()) {
        ssize_t n = ::write(fd, buf.data() + off, buf.size() - off);
        if (n < 0) {
            ::close(fd);
            s.last_error = std::string("snapshot write failed: ") + strerror(errno);
            return false;
        }
        off += static_cast<size_t>(n);
    }
    if (fdatasync(fd) != 0 || ::close(fd) != 0) {
        s.last_error = "snapshot sync failed";
        return false;
    }
    if (::rename(tmp_path.c_str(), snap_path.c_str()) != 0) {
        s.last_error = std::string("snapshot rename failed: ") + strerror(errno);
        return false;
    }
    return true;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

// Opens (creating if needed) a store rooted at `dir`. Returns handle or null.
void* ts_open(const char* dir) {
    crc32_init();
    auto s = std::make_unique<Store>();
    s->dir = dir;
    ::mkdir(dir, 0755);

    std::string snap;
    if (read_file(s->dir + "/store.snap", snap)) replay(*s, snap);
    std::string log;
    std::string log_path = s->dir + "/store.log";
    size_t valid = 0;
    if (read_file(log_path, log)) valid = replay(*s, log);

    s->log_fd = ::open(log_path.c_str(), O_WRONLY | O_CREAT, 0644);
    if (s->log_fd < 0) return nullptr;
    // Truncate any torn tail so new appends start at the last valid record.
    if (ftruncate(s->log_fd, static_cast<off_t>(valid)) != 0) {
        ::close(s->log_fd);
        return nullptr;
    }
    if (lseek(s->log_fd, static_cast<off_t>(valid), SEEK_SET) < 0) {
        ::close(s->log_fd);
        return nullptr;
    }
    s->log_bytes = valid;
    return s.release();
}

void ts_close(void* h) {
    if (!h) return;
    Store* s = static_cast<Store*>(h);
    {
        std::unique_lock lock(s->mtx);
        flush_wbuf(*s);
        if (s->log_fd >= 0) {
            fdatasync(s->log_fd);
            ::close(s->log_fd);
        }
    }
    delete s;
}

int ts_put(void* h, const char* db, const uint8_t* key, uint32_t klen, const uint8_t* val, uint32_t vlen) {
    Store* s = static_cast<Store*>(h);
    std::unique_lock lock(s->mtx);
    return log_and_apply(*s, OP_PUT, db, Bytes(reinterpret_cast<const char*>(key), klen),
                         Bytes(reinterpret_cast<const char*>(val), vlen))
               ? 1
               : 0;
}

int ts_del(void* h, const char* db, const uint8_t* key, uint32_t klen) {
    Store* s = static_cast<Store*>(h);
    std::unique_lock lock(s->mtx);
    return log_and_apply(*s, OP_DEL, db, Bytes(reinterpret_cast<const char*>(key), klen), Bytes()) ? 1 : 0;
}

int ts_dup_put(void* h, const char* db, const uint8_t* key, uint32_t klen, const uint8_t* val, uint32_t vlen) {
    Store* s = static_cast<Store*>(h);
    std::unique_lock lock(s->mtx);
    return log_and_apply(*s, OP_DUP_PUT, db, Bytes(reinterpret_cast<const char*>(key), klen),
                         Bytes(reinterpret_cast<const char*>(val), vlen))
               ? 1
               : 0;
}

int ts_dup_del(void* h, const char* db, const uint8_t* key, uint32_t klen, const uint8_t* val, uint32_t vlen) {
    Store* s = static_cast<Store*>(h);
    std::unique_lock lock(s->mtx);
    return log_and_apply(*s, OP_DUP_DEL, db, Bytes(reinterpret_cast<const char*>(key), klen),
                         Bytes(reinterpret_cast<const char*>(val), vlen))
               ? 1
               : 0;
}

int ts_drop_db(void* h, const char* db) {
    Store* s = static_cast<Store*>(h);
    std::unique_lock lock(s->mtx);
    return log_and_apply(*s, OP_DROP_DB, db, Bytes(), Bytes()) ? 1 : 0;
}

// Batched dupsort put: concatenated [u32 klen][key][u32 vlen][val] pairs.
// Returns number of pairs actually inserted (duplicates skipped).
int64_t ts_dup_putmulti(void* h, const char* db, const uint8_t* buf, uint64_t buflen) {
    Store* s = static_cast<Store*>(h);
    std::unique_lock lock(s->mtx);
    int64_t inserted = 0;
    uint64_t off = 0;
    while (off + 8 <= buflen) {
        uint32_t klen;
        memcpy(&klen, buf + off, 4);
        off += 4;
        if (off + klen + 4 > buflen) return -1;
        Bytes key(reinterpret_cast<const char*>(buf + off), klen);
        off += klen;
        uint32_t vlen;
        memcpy(&vlen, buf + off, 4);
        off += 4;
        if (off + vlen > buflen) return -1;
        Bytes val(reinterpret_cast<const char*>(buf + off), vlen);
        off += vlen;
        if (log_and_apply(*s, OP_DUP_PUT, db, key, val)) inserted++;
    }
    return inserted;
}

// Get a plain value. Returns 1 and sets *val to a malloc'd copy (caller
// frees via ts_free — an owned copy, so concurrent writers can't invalidate
// it after the lock drops) or 0 if absent.
int ts_get(void* h, const char* db, const uint8_t* key, uint32_t klen, uint8_t** val, uint32_t* vlen) {
    Store* s = static_cast<Store*>(h);
    std::shared_lock lock(s->mtx);
    auto dbit = s->dbs.find(db);
    if (dbit == s->dbs.end()) return 0;
    auto it = dbit->second.data.find(Bytes(reinterpret_cast<const char*>(key), klen));
    if (it == dbit->second.data.end() || it->second.empty()) return 0;
    const Bytes& v = it->second[0];
    uint8_t* out = static_cast<uint8_t*>(malloc(v.size() ? v.size() : 1));
    memcpy(out, v.data(), v.size());
    *val = out;
    *vlen = static_cast<uint32_t>(v.size());
    return 1;
}

// Batched plain put: concatenated [u32 klen][key][u32 vlen][val] pairs.
// Returns the number of pairs applied (replacements count), -1 on malformed
// input.
int64_t ts_putmulti(void* h, const char* db, const uint8_t* buf, uint64_t buflen) {
    Store* s = static_cast<Store*>(h);
    std::unique_lock lock(s->mtx);
    int64_t applied = 0;
    uint64_t off = 0;
    while (off + 8 <= buflen) {
        uint32_t klen;
        memcpy(&klen, buf + off, 4);
        off += 4;
        if (off + klen + 4 > buflen) return -1;
        Bytes key(reinterpret_cast<const char*>(buf + off), klen);
        off += klen;
        uint32_t vlen;
        memcpy(&vlen, buf + off, 4);
        off += 4;
        if (off + vlen > buflen) return -1;
        Bytes val(reinterpret_cast<const char*>(buf + off), vlen);
        off += vlen;
        if (log_and_apply(*s, OP_PUT, db, key, val)) applied++;
    }
    return applied;
}

// Iteration / scan results are serialized into a malloc'd buffer of
// concatenated [u32 klen][key][u32 vlen][val] pairs. Caller frees via ts_free.
namespace {
struct ScanBuf {
    std::string data;
    uint64_t count = 0;
};

uint8_t* finish_scan(ScanBuf& sb, uint64_t* out_len, uint64_t* out_count) {
    *out_len = sb.data.size();
    *out_count = sb.count;
    if (sb.data.empty()) return nullptr;
    uint8_t* out = static_cast<uint8_t*>(malloc(sb.data.size()));
    memcpy(out, sb.data.data(), sb.data.size());
    return out;
}

void append_pair(ScanBuf& sb, const Bytes& key, const Bytes& val) {
    put_u32(sb.data, static_cast<uint32_t>(key.size()));
    sb.data.append(key);
    put_u32(sb.data, static_cast<uint32_t>(val.size()));
    sb.data.append(val);
    sb.count++;
}
}  // namespace

void ts_free(uint8_t* p) { free(p); }

// All (key, value) pairs whose key starts with `prefix` (dup values expanded),
// in key order. limit==0 means unlimited.
uint8_t* ts_prefix_scan(void* h, const char* db, const uint8_t* prefix, uint32_t plen, uint64_t limit,
                        uint64_t* out_len, uint64_t* out_count) {
    Store* s = static_cast<Store*>(h);
    std::shared_lock lock(s->mtx);
    ScanBuf sb;
    auto dbit = s->dbs.find(db);
    if (dbit != s->dbs.end()) {
        Bytes pref(reinterpret_cast<const char*>(prefix), plen);
        for (auto it = dbit->second.data.lower_bound(pref); it != dbit->second.data.end(); ++it) {
            if (it->first.compare(0, pref.size(), pref) != 0) break;
            for (const auto& v : it->second) {
                append_pair(sb, it->first, v);
                if (limit && sb.count >= limit) goto done;
            }
        }
    }
done:
    return finish_scan(sb, out_len, out_count);
}

// All values for an exact key (dupsort), serialized as [u32 vlen][val]...
uint8_t* ts_get_dups(void* h, const char* db, const uint8_t* key, uint32_t klen, uint64_t limit, uint64_t* out_len,
                     uint64_t* out_count) {
    Store* s = static_cast<Store*>(h);
    std::shared_lock lock(s->mtx);
    ScanBuf sb;
    auto dbit = s->dbs.find(db);
    if (dbit != s->dbs.end()) {
        auto it = dbit->second.data.find(Bytes(reinterpret_cast<const char*>(key), klen));
        if (it != dbit->second.data.end()) {
            for (const auto& v : it->second) {
                put_u32(sb.data, static_cast<uint32_t>(v.size()));
                sb.data.append(v);
                sb.count++;
                if (limit && sb.count >= limit) break;
            }
        }
    }
    return finish_scan(sb, out_len, out_count);
}

// Full scan of a db from `start` key (inclusive), up to `limit` pairs.
uint8_t* ts_range_scan(void* h, const char* db, const uint8_t* start, uint32_t slen, uint64_t limit,
                       uint64_t* out_len, uint64_t* out_count) {
    Store* s = static_cast<Store*>(h);
    std::shared_lock lock(s->mtx);
    ScanBuf sb;
    auto dbit = s->dbs.find(db);
    if (dbit != s->dbs.end()) {
        Bytes st(reinterpret_cast<const char*>(start), slen);
        for (auto it = dbit->second.data.lower_bound(st); it != dbit->second.data.end(); ++it) {
            for (const auto& v : it->second) {
                append_pair(sb, it->first, v);
                if (limit && sb.count >= limit) goto done;
            }
        }
    }
done:
    return finish_scan(sb, out_len, out_count);
}

int64_t ts_entries(void* h, const char* db) {
    Store* s = static_cast<Store*>(h);
    std::shared_lock lock(s->mtx);
    auto dbit = s->dbs.find(db);
    return dbit == s->dbs.end() ? 0 : static_cast<int64_t>(dbit->second.entries);
}

int64_t ts_key_count(void* h, const char* db) {
    Store* s = static_cast<Store*>(h);
    std::shared_lock lock(s->mtx);
    auto dbit = s->dbs.find(db);
    return dbit == s->dbs.end() ? 0 : static_cast<int64_t>(dbit->second.data.size());
}

// Approximate resident payload bytes across all dbs (monitoring parity with
// lmdb_used_bytes — reference indexes/common.py:57).
int64_t ts_used_bytes(void* h) {
    Store* s = static_cast<Store*>(h);
    std::shared_lock lock(s->mtx);
    int64_t total = 0;
    for (const auto& [name, db] : s->dbs) total += static_cast<int64_t>(db.bytes + name.size());
    return total;
}

// List db names, serialized as [u32 len][name]...
uint8_t* ts_list_dbs(void* h, uint64_t* out_len, uint64_t* out_count) {
    Store* s = static_cast<Store*>(h);
    std::shared_lock lock(s->mtx);
    ScanBuf sb;
    for (const auto& [name, db] : s->dbs) {
        put_u32(sb.data, static_cast<uint32_t>(name.size()));
        sb.data.append(name);
        sb.count++;
    }
    return finish_scan(sb, out_len, out_count);
}

// Flush buffered appends to the OS (no fsync).
int ts_flush(void* h) {
    Store* s = static_cast<Store*>(h);
    std::unique_lock lock(s->mtx);
    return flush_wbuf(*s) ? 1 : 0;
}

// Flush + fdatasync the log (durability point).
int ts_sync(void* h) {
    Store* s = static_cast<Store*>(h);
    std::unique_lock lock(s->mtx);
    if (!flush_wbuf(*s)) return 0;
    return fdatasync(s->log_fd) == 0 ? 1 : 0;
}

// Write a compacted snapshot and truncate the log.
int ts_compact(void* h) {
    Store* s = static_cast<Store*>(h);
    std::unique_lock lock(s->mtx);
    if (!flush_wbuf(*s)) return 0;
    if (!write_snapshot(*s)) return 0;
    if (ftruncate(s->log_fd, 0) != 0) return 0;
    if (lseek(s->log_fd, 0, SEEK_SET) < 0) return 0;
    s->log_bytes = 0;
    return 1;
}

uint64_t ts_log_bytes(void* h) {
    Store* s = static_cast<Store*>(h);
    std::shared_lock lock(s->mtx);
    return s->log_bytes + s->wbuf.size();
}

const char* ts_last_error(void* h) {
    Store* s = static_cast<Store*>(h);
    return s->last_error.c_str();
}

}  // extern "C"
