// Native HTTP/1.1 serving front end for aptai-serve.
//
// The Python serving stack (aptai_tpu/infer/serve.py) measured its last
// wall at the transport: with binary responses the engine underneath runs
// ~3000 audio-s/s but pure-Python http.server on the 1-core host caps the
// HTTP path an order of magnitude lower (benchmarks/PERF.md round 3).  The
// reference has no serving surface at all (its inference is eager batch-1,
// reference models/aptai.py:125-179); this file is the native runtime the
// task calls for: socket I/O, HTTP parsing, wire-audio decoding and
// micro-batch coalescing all happen here, off the GIL — Python only runs
// the device program and formats responses.
//
// Architecture (one epoll I/O thread per server):
//
//   sockets -> epoll -> parse -> [fast: POST /v1/predict octet-stream]
//                                  decode audio -> fast queue
//                               [slow: everything else]
//                                  raw request   -> slow queue
//   Python drains the fast queue in batches (aptai_http_next_batch blocks
//   with the GIL released — ctypes), runs the jitted forward, and answers
//   via aptai_http_respond; the I/O thread frames and writes responses,
//   preserving per-connection request order (HTTP/1.1 pipelining safety).
//
// Plain C ABI; bound via ctypes in aptai_tpu/infer/native_transport.py.

#include <arpa/inet.h>
#include <errno.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <string.h>
#include <sys/epoll.h>
#include <sys/eventfd.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <deque>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

int64_t now_us() {
    return std::chrono::duration_cast<std::chrono::microseconds>(
               std::chrono::steady_clock::now().time_since_epoch())
        .count();
}

std::string lower(std::string s) {
    for (auto &c : s)
        if (c >= 'A' && c <= 'Z') c += 32;
    return s;
}

// Case-insensitive header lookup inside a raw CRLF-separated header block.
std::string header_value(const std::string &block, const std::string &name) {
    std::string needle = lower(name) + ":";
    size_t pos = 0;
    while (pos < block.size()) {
        size_t eol = block.find("\r\n", pos);
        if (eol == std::string::npos) eol = block.size();
        std::string line = block.substr(pos, eol - pos);
        if (lower(line.substr(0, needle.size())) == needle) {
            std::string v = line.substr(needle.size());
            size_t b = v.find_first_not_of(" \t");
            size_t e = v.find_last_not_of(" \t");
            if (b == std::string::npos) return "";
            return v.substr(b, e - b + 1);
        }
        pos = eol + 2;
    }
    return "";
}

const char *reason_for(int status) {
    switch (status) {
        case 200: return "OK";
        case 400: return "Bad Request";
        case 404: return "Not Found";
        case 413: return "Payload Too Large";
        case 431: return "Request Header Fields Too Large";
        case 500: return "Internal Server Error";
        case 501: return "Not Implemented";
        case 503: return "Service Unavailable";
        default: return "Status";
    }
}

struct FastReq {
    uint64_t id;
    std::vector<float> audio;
    std::string query;  // raw query string (incl. folded response-format)
    int64_t recv_us;
};

struct SlowReq {
    uint64_t id;
    std::string method, target, headers;
    std::vector<uint8_t> body;
};

struct Resp {
    uint64_t id;
    int status;
    std::string ctype;
    std::string body;
};

struct ReqSlot {  // I/O-thread-owned bookkeeping for an in-flight request
    int fd;
    uint64_t gen;
    uint64_t seq;
    bool close_after;
};

struct Conn {
    int fd = -1;
    uint64_t gen = 0;
    std::string in;
    std::string out;
    size_t out_off = 0;
    uint64_t next_assign = 0;  // seq for the next parsed request
    uint64_t next_send = 0;    // seq of the next response to write
    std::map<uint64_t, std::pair<std::string, bool>> ready;  // seq -> (bytes, close)
    bool want_write = false;
    bool closing = false;  // close once all pending responses are flushed
};

struct Server {
    ~Server() {
        if (listen_fd >= 0) ::close(listen_fd);
        if (epoll_fd >= 0) ::close(epoll_fd);
        if (event_fd >= 0) ::close(event_fd);
    }
    int listen_fd = -1;
    int epoll_fd = -1;
    int event_fd = -1;
    int port = 0;
    int64_t max_body = 0;
    int64_t max_fast_samples = 0;
    float mulaw_lut[256];  // installed from Python for bit-exactness
    bool has_mulaw_lut = false;
    std::thread io;
    std::atomic<bool> stopped{false};

    std::mutex qm;
    std::condition_variable fast_cv, slow_cv;
    std::deque<FastReq> fast_q;
    std::deque<SlowReq> slow_q;
    std::unordered_map<uint64_t, std::vector<uint8_t>> slow_bodies;

    std::mutex rm;
    std::deque<Resp> resp_q;

    // I/O-thread-owned state
    std::unordered_map<int, Conn> conns;
    std::unordered_map<uint64_t, ReqSlot> inflight;
    uint64_t next_req_id = 1;
    uint64_t next_gen = 1;
};

void set_nonblock(int fd) {
    int fl = fcntl(fd, F_GETFL, 0);
    fcntl(fd, F_SETFL, fl | O_NONBLOCK);
}

void frame_response(std::string &out, int status, const std::string &ctype,
                    const char *body, size_t body_len, bool close_after) {
    out.reserve(out.size() + 160 + body_len);
    out += "HTTP/1.1 ";
    out += std::to_string(status);
    out += ' ';
    out += reason_for(status);
    out += "\r\nContent-Type: ";
    out += ctype;
    out += "\r\nContent-Length: ";
    out += std::to_string(body_len);
    out += close_after ? "\r\nConnection: close\r\n\r\n"
                       : "\r\nConnection: keep-alive\r\n\r\n";
    out.append(body, body_len);
}

void conn_mod_events(Server &s, Conn &c) {
    epoll_event ev{};
    ev.events = EPOLLIN | (c.want_write ? EPOLLOUT : 0u);
    ev.data.fd = c.fd;
    epoll_ctl(s.epoll_fd, EPOLL_CTL_MOD, c.fd, &ev);
}

void close_conn(Server &s, int fd) {
    auto it = s.conns.find(fd);
    if (it == s.conns.end()) return;
    epoll_ctl(s.epoll_fd, EPOLL_CTL_DEL, fd, nullptr);
    ::close(fd);
    s.conns.erase(it);  // in-flight slots with a stale gen are dropped later
}

// Write as much of c.out as the socket accepts; returns false if the
// connection died.
bool flush_writes(Server &s, Conn &c) {
    while (c.out_off < c.out.size()) {
        ssize_t n = ::send(c.fd, c.out.data() + c.out_off,
                           c.out.size() - c.out_off, MSG_NOSIGNAL);
        if (n > 0) {
            c.out_off += static_cast<size_t>(n);
            continue;
        }
        if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
            if (!c.want_write) {
                c.want_write = true;
                conn_mod_events(s, c);
            }
            return true;
        }
        close_conn(s, c.fd);
        return false;
    }
    c.out.clear();
    c.out_off = 0;
    if (c.want_write) {
        c.want_write = false;
        conn_mod_events(s, c);
    }
    if (c.closing && c.ready.empty() && c.next_send == c.next_assign) {
        close_conn(s, c.fd);
        return false;
    }
    return true;
}

// Move in-order completed responses into the connection's write buffer.
void pump_ready(Server &s, Conn &c) {
    bool close_now = false;
    for (;;) {
        auto it = c.ready.find(c.next_send);
        if (it == c.ready.end()) break;
        c.out += it->second.first;
        if (it->second.second) close_now = true;  // Connection: close request
        c.ready.erase(it);
        ++c.next_send;
        if (close_now) break;
    }
    if (close_now) c.closing = true;
    flush_writes(s, c);
}

// Queue a response produced by the I/O thread itself (parse errors).
void local_response(Server &s, Conn &c, int status, const std::string &msg,
                    bool close_after) {
    std::string body = "{\"error\": \"" + msg + "\"}";
    std::string framed;
    frame_response(framed, status, "application/json", body.data(),
                   body.size(), close_after);
    c.ready.emplace(c.next_assign++,
                    std::make_pair(std::move(framed), close_after));
    pump_ready(s, c);
}

// True iff the query string has a parameter NAMED "format" ("format=..."
// at the start or after '&').  A substring search would false-positive on
// names merely ending in "format" (e.g. "informat=x"), diverging from the
// Python transport's parsed-key check.
bool query_has_format(const std::string &q) {
    size_t pos = 0;
    while (pos < q.size()) {
        if (q.compare(pos, 7, "format=") == 0) return true;
        size_t amp = q.find('&', pos);
        if (amp == std::string::npos) break;
        pos = amp + 1;
    }
    return false;
}

bool decode_wire(const Server &s, const std::string &enc,
                 const uint8_t *body, size_t len, std::vector<float> &out) {
    if (enc.empty() || enc == "float32") {
        if (len % 4) return false;
        out.resize(len / 4);
        memcpy(out.data(), body, len);
        return true;
    }
    if (enc == "int16") {
        if (len % 2) return false;
        out.resize(len / 2);
        const int16_t *p = reinterpret_cast<const int16_t *>(body);
        const float k = 1.0f / 32768.0f;
        for (size_t i = 0; i < out.size(); ++i) out[i] = p[i] * k;
        return true;
    }
    if (enc == "uint8_mulaw") {
        // inverse of infer/api.py quantize_mulaw (continuous G.711 form).
        // The 256-entry table is computed with numpy on the Python side and
        // installed at startup so the expansion is bit-identical to the
        // stdlib transport's _mulaw_expand_host (libm expm1f and numpy's
        // can differ in the last ulp); the formula below is the fallback.
        out.resize(len);
        if (s.has_mulaw_lut) {
            for (size_t i = 0; i < len; ++i) out[i] = s.mulaw_lut[body[i]];
            return true;
        }
        const float inv127 = 1.0f / 127.0f;
        const float ln_mu1 = std::log1p(255.0f);
        for (size_t i = 0; i < len; ++i) {
            float y = (static_cast<float>(body[i]) - 128.0f) * inv127;
            float a = std::expm1(std::fabs(y) * ln_mu1) / 255.0f;
            out[i] = y < 0 ? -a : a;
        }
        return true;
    }
    return false;  // unknown encoding -> slow path (Python's 400 message)
}

// One complete request (headers + body) has been parsed: route it.
void route_request(Server &s, Conn &c, const std::string &method,
                   const std::string &target, const std::string &hdr_block,
                   const uint8_t *body, size_t body_len, bool http10) {
    std::string conn_hdr = lower(header_value(hdr_block, "Connection"));
    bool close_after = conn_hdr == "close" ||
                       (http10 && conn_hdr != "keep-alive");

    uint64_t id = s.next_req_id++;
    s.inflight[id] = ReqSlot{c.fd, c.gen, c.next_assign++, close_after};

    size_t qpos = target.find('?');
    std::string path = target.substr(0, qpos);
    std::string query =
        qpos == std::string::npos ? "" : target.substr(qpos + 1);

    bool fast = false;
    std::vector<float> audio;
    if (method == "POST" && path == "/v1/predict" &&
        header_value(hdr_block, "Transfer-Encoding").empty()) {
        std::string ct = lower(header_value(hdr_block, "Content-Type"));
        std::string sr = header_value(hdr_block, "X-Sample-Rate");
        std::string enc = header_value(hdr_block, "X-Audio-Encoding");
        if (ct.substr(0, ct.find(';')).find("application/json") ==
                std::string::npos &&
            (sr.empty() || sr == "16000") && body_len > 0 &&
            decode_wire(s, enc, body, body_len, audio) && !audio.empty() &&
            static_cast<int64_t>(audio.size()) <= s.max_fast_samples) {
            fast = true;
        }
    }

    if (fast) {
        std::string xrf = header_value(hdr_block, "X-Response-Format");
        if (!xrf.empty() && !query_has_format(query)) {
            if (!query.empty()) query += '&';
            query += "format=" + xrf;
        }
        FastReq r;
        r.id = id;
        r.audio = std::move(audio);
        r.query = std::move(query);
        r.recv_us = now_us();
        {
            std::lock_guard<std::mutex> lk(s.qm);
            s.fast_q.push_back(std::move(r));
        }
        s.fast_cv.notify_one();
    } else {
        SlowReq r;
        r.id = id;
        r.method = method;
        r.target = target;
        r.headers = hdr_block;
        r.body.assign(body, body + body_len);
        {
            std::lock_guard<std::mutex> lk(s.qm);
            s.slow_q.push_back(std::move(r));
        }
        s.slow_cv.notify_one();
    }
}

// Parse as many complete requests as c.in holds; returns false if the
// connection was closed due to a protocol error.
bool parse_conn(Server &s, Conn &c) {
    for (;;) {
        size_t hdr_end = c.in.find("\r\n\r\n");
        if (hdr_end == std::string::npos) {
            if (c.in.size() > 65536) {
                local_response(s, c, 431, "request headers too large", true);
                return false;
            }
            return true;
        }
        // the cap must also hold when the terminator IS present (one recv
        // burst can deliver the whole oversized block at once) — it is the
        // authoritative bound the Python slow-lane buffers are sized to
        if (hdr_end > 65536) {
            local_response(s, c, 431, "request headers too large", true);
            return false;
        }
        size_t line_end = c.in.find("\r\n");
        std::string req_line = c.in.substr(0, line_end);
        size_t sp1 = req_line.find(' ');
        size_t sp2 = req_line.rfind(' ');
        if (sp1 == std::string::npos || sp2 <= sp1) {
            local_response(s, c, 400, "malformed request line", true);
            return false;
        }
        std::string method = req_line.substr(0, sp1);
        std::string target = req_line.substr(sp1 + 1, sp2 - sp1 - 1);
        bool http10 = req_line.substr(sp2 + 1) == "HTTP/1.0";
        std::string hdr_block =
            c.in.substr(line_end + 2, hdr_end - line_end - 2);

        int64_t clen = 0;
        std::string cl = header_value(hdr_block, "Content-Length");
        if (!cl.empty()) {
            char *end = nullptr;
            clen = strtoll(cl.c_str(), &end, 10);
            if (clen < 0 || (end && *end)) {
                local_response(s, c, 400, "bad Content-Length", true);
                return false;
            }
        }
        if (clen > s.max_body) {
            local_response(s, c, 413, "request body too large", true);
            return false;
        }
        size_t total = hdr_end + 4 + static_cast<size_t>(clen);
        if (c.in.size() < total) return true;  // body still in flight

        route_request(s, c,  method, target, hdr_block,
                      reinterpret_cast<const uint8_t *>(c.in.data()) +
                          hdr_end + 4,
                      static_cast<size_t>(clen), http10);
        c.in.erase(0, total);
    }
}

void drain_responses(Server &s) {
    uint64_t junk;
    while (::read(s.event_fd, &junk, 8) == 8) {
    }
    std::deque<Resp> batch;
    {
        std::lock_guard<std::mutex> lk(s.rm);
        batch.swap(s.resp_q);
    }
    for (auto &r : batch) {
        auto it = s.inflight.find(r.id);
        if (it == s.inflight.end()) continue;
        ReqSlot slot = it->second;
        s.inflight.erase(it);
        auto cit = s.conns.find(slot.fd);
        if (cit == s.conns.end() || cit->second.gen != slot.gen)
            continue;  // connection died while the request was in flight
        std::string framed;
        frame_response(framed, r.status, r.ctype, r.body.data(),
                       r.body.size(), slot.close_after);
        cit->second.ready.emplace(
            slot.seq, std::make_pair(std::move(framed), slot.close_after));
        pump_ready(s, cit->second);
    }
}

void io_loop(Server *s) {
    epoll_event evs[64];
    std::vector<char> buf(1 << 16);
    while (!s->stopped.load(std::memory_order_relaxed)) {
        int n = epoll_wait(s->epoll_fd, evs, 64, 200);
        for (int i = 0; i < n; ++i) {
            int fd = evs[i].data.fd;
            if (fd == s->listen_fd) {
                for (;;) {
                    int cfd = ::accept(s->listen_fd, nullptr, nullptr);
                    if (cfd < 0) break;
                    set_nonblock(cfd);
                    int one = 1;
                    setsockopt(cfd, IPPROTO_TCP, TCP_NODELAY, &one,
                               sizeof(one));
                    Conn c;
                    c.fd = cfd;
                    c.gen = s->next_gen++;
                    s->conns.emplace(cfd, std::move(c));
                    epoll_event ev{};
                    ev.events = EPOLLIN;
                    ev.data.fd = cfd;
                    epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, cfd, &ev);
                }
                continue;
            }
            if (fd == s->event_fd) {
                drain_responses(*s);
                continue;
            }
            auto cit = s->conns.find(fd);
            if (cit == s->conns.end()) continue;
            Conn &c = cit->second;
            if (evs[i].events & (EPOLLHUP | EPOLLERR)) {
                close_conn(*s, fd);
                continue;
            }
            if (evs[i].events & EPOLLOUT) {
                if (!flush_writes(*s, c)) continue;
            }
            if (evs[i].events & EPOLLIN) {
                bool dead = false;
                for (;;) {
                    ssize_t r = ::recv(fd, buf.data(), buf.size(), 0);
                    if (r > 0) {
                        c.in.append(buf.data(), static_cast<size_t>(r));
                        continue;
                    }
                    if (r < 0 && (errno == EAGAIN || errno == EWOULDBLOCK))
                        break;
                    close_conn(*s, fd);  // EOF or hard error
                    dead = true;
                    break;
                }
                if (!dead && !c.in.empty()) parse_conn(*s, c);
            }
        }
    }
    // shutdown: close everything owned by the I/O thread
    for (auto &kv : s->conns) ::close(kv.first);
    s->conns.clear();
}

std::mutex g_handles_m;
std::unordered_map<int64_t, std::shared_ptr<Server>> g_handles;
int64_t g_next_handle = 1;

// shared_ptr ownership: a caller blocked inside next_batch/next_slow keeps
// the Server alive across a concurrent aptai_http_stop (which only erases
// the handle, wakes the waiters, and joins the I/O thread; fds close in
// ~Server when the last reference drops).
std::shared_ptr<Server> get_server(int64_t h) {
    std::lock_guard<std::mutex> lk(g_handles_m);
    auto it = g_handles.find(h);
    return it == g_handles.end() ? nullptr : it->second;
}

}  // namespace

extern "C" {

int64_t aptai_http_start(const char *host, int32_t port,
                         int64_t max_body_bytes, int64_t max_fast_samples) {
    auto s = std::make_shared<Server>();
    s->max_body = max_body_bytes > 0 ? max_body_bytes : (1LL << 30);
    s->max_fast_samples = max_fast_samples > 0 ? max_fast_samples : 16000 * 60;

    s->listen_fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (s->listen_fd < 0) return -1;
    int one = 1;
    setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(static_cast<uint16_t>(port));
    if (inet_pton(AF_INET, host ? host : "127.0.0.1", &addr.sin_addr) != 1)
        return -1;  // ~Server closes the fds on every failure path
    if (::bind(s->listen_fd, reinterpret_cast<sockaddr *>(&addr),
               sizeof(addr)) < 0 ||
        ::listen(s->listen_fd, 512) < 0)
        return -1;
    socklen_t alen = sizeof(addr);
    getsockname(s->listen_fd, reinterpret_cast<sockaddr *>(&addr), &alen);
    s->port = ntohs(addr.sin_port);
    set_nonblock(s->listen_fd);

    s->epoll_fd = epoll_create1(0);
    s->event_fd = eventfd(0, EFD_NONBLOCK);
    if (s->epoll_fd < 0 || s->event_fd < 0) return -1;
    epoll_event ev{};
    ev.events = EPOLLIN;
    ev.data.fd = s->listen_fd;
    epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, s->listen_fd, &ev);
    ev.data.fd = s->event_fd;
    epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, s->event_fd, &ev);

    s->io = std::thread(io_loop, s.get());

    std::lock_guard<std::mutex> lk(g_handles_m);
    int64_t h = g_next_handle++;
    g_handles.emplace(h, std::move(s));
    return h;
}

int32_t aptai_http_port(int64_t h) {
    auto s = get_server(h);
    return s ? s->port : -1;
}

// Install the 256-entry mu-law expansion table (call right after start,
// before taking traffic — the I/O thread reads it without a lock).
void aptai_http_set_mulaw_table(int64_t h, const float *table256) {
    auto s = get_server(h);
    if (!s || !table256) return;
    memcpy(s->mulaw_lut, table256, 256 * sizeof(float));
    s->has_mulaw_lut = true;
}

void aptai_http_stop(int64_t h) {
    std::shared_ptr<Server> s;
    {
        std::lock_guard<std::mutex> lk(g_handles_m);
        auto it = g_handles.find(h);
        if (it == g_handles.end()) return;
        s = std::move(it->second);
        g_handles.erase(it);
    }
    {
        // take the queue lock so notify_all can't land between a waiter's
        // predicate check and its wait
        std::lock_guard<std::mutex> lk(s->qm);
        s->stopped.store(true);
    }
    s->fast_cv.notify_all();
    s->slow_cv.notify_all();
    uint64_t one = 1;
    (void)!::write(s->event_fd, &one, 8);
    if (s->io.joinable()) s->io.join();
    // fds close in ~Server once the last concurrent caller releases its
    // shared_ptr
}

// Blocks (ctypes releases the GIL) up to wait_first_ms for one request,
// then coalesces up to max_batch for at most wait_more_ms more.  Fills the
// caller's (max_batch, stride) float32 audio buffer plus per-request
// lengths / ids / receive timestamps / query strings (query_cap bytes
// each, NUL-terminated).  Returns the number of requests (0 on timeout,
// -1 after stop).
int32_t aptai_http_next_batch(int64_t h, int32_t max_batch,
                              int32_t wait_first_ms, int32_t wait_more_ms,
                              float *audio, int64_t stride, int32_t *lengths,
                              uint64_t *req_ids, int64_t *recv_us,
                              char *queries, int32_t query_cap) {
    auto s = get_server(h);
    if (!s) return -1;
    std::vector<FastReq> got;
    {
        std::unique_lock<std::mutex> lk(s->qm);
        if (!s->fast_cv.wait_for(
                lk, std::chrono::milliseconds(wait_first_ms),
                [&] { return s->stopped.load() || !s->fast_q.empty(); }))
            return 0;
        if (s->stopped.load() && s->fast_q.empty()) return -1;
        auto deadline = std::chrono::steady_clock::now() +
                        std::chrono::milliseconds(wait_more_ms);
        for (;;) {
            while (!s->fast_q.empty() &&
                   static_cast<int32_t>(got.size()) < max_batch) {
                got.push_back(std::move(s->fast_q.front()));
                s->fast_q.pop_front();
            }
            if (static_cast<int32_t>(got.size()) >= max_batch ||
                s->stopped.load())
                break;
            if (s->fast_cv.wait_until(lk, deadline, [&] {
                    return s->stopped.load() || !s->fast_q.empty();
                })) {
                continue;
            }
            break;  // coalesce window elapsed
        }
    }
    for (size_t i = 0; i < got.size(); ++i) {
        FastReq &r = got[i];
        int64_t n = static_cast<int64_t>(r.audio.size());
        if (n > stride) n = stride;  // guarded at route; belt-and-braces
        memcpy(audio + i * stride, r.audio.data(),
               static_cast<size_t>(n) * sizeof(float));
        lengths[i] = static_cast<int32_t>(n);
        req_ids[i] = r.id;
        recv_us[i] = r.recv_us;
        char *q = queries + i * query_cap;
        size_t qn = r.query.size();
        if (qn >= static_cast<size_t>(query_cap))
            qn = static_cast<size_t>(query_cap) - 1;
        memcpy(q, r.query.data(), qn);
        q[qn] = '\0';
    }
    return static_cast<int32_t>(got.size());
}

// Dequeue one non-fast-path request (or return 0 after wait_ms).  The body
// is fetched separately with aptai_http_fetch_body to avoid a giant
// preallocated buffer (stream uploads can be hundreds of MB).
int32_t aptai_http_next_slow(int64_t h, int32_t wait_ms, uint64_t *req_id,
                             char *method, int32_t method_cap, char *target,
                             int32_t target_cap, char *headers,
                             int32_t headers_cap, int64_t *body_len) {
    auto s = get_server(h);
    if (!s) return -1;
    SlowReq r;
    {
        std::unique_lock<std::mutex> lk(s->qm);
        if (!s->slow_cv.wait_for(
                lk, std::chrono::milliseconds(wait_ms),
                [&] { return s->stopped.load() || !s->slow_q.empty(); }))
            return 0;
        if (s->slow_q.empty()) return -1;  // stopped
        r = std::move(s->slow_q.front());
        s->slow_q.pop_front();
        *body_len = static_cast<int64_t>(r.body.size());
        s->slow_bodies.emplace(r.id, std::move(r.body));
    }
    auto put = [](char *dst, int32_t cap, const std::string &src) {
        size_t n = src.size() < static_cast<size_t>(cap - 1)
                       ? src.size()
                       : static_cast<size_t>(cap - 1);
        memcpy(dst, src.data(), n);
        dst[n] = '\0';
    };
    *req_id = r.id;
    put(method, method_cap, r.method);
    put(target, target_cap, r.target);
    put(headers, headers_cap, r.headers);
    return 1;
}

int64_t aptai_http_fetch_body(int64_t h, uint64_t req_id, uint8_t *buf,
                              int64_t cap) {
    auto s = get_server(h);
    if (!s) return -1;
    std::lock_guard<std::mutex> lk(s->qm);
    auto it = s->slow_bodies.find(req_id);
    if (it == s->slow_bodies.end()) return -1;
    int64_t n = static_cast<int64_t>(it->second.size());
    if (n > cap) n = cap;
    memcpy(buf, it->second.data(), static_cast<size_t>(n));
    s->slow_bodies.erase(it);
    return n;
}

void aptai_http_respond(int64_t h, uint64_t req_id, int32_t status,
                        const char *content_type, const uint8_t *body,
                        int64_t body_len) {
    auto s = get_server(h);
    if (!s) return;
    {
        std::lock_guard<std::mutex> lk(s->qm);
        s->slow_bodies.erase(req_id);  // free an unfetched body, if any
    }
    Resp r;
    r.id = req_id;
    r.status = status;
    r.ctype = content_type ? content_type : "application/json";
    r.body.assign(reinterpret_cast<const char *>(body),
                  static_cast<size_t>(body_len));
    {
        std::lock_guard<std::mutex> lk(s->rm);
        s->resp_q.push_back(std::move(r));
    }
    uint64_t one = 1;
    (void)!::write(s->event_fd, &one, 8);
}

}  // extern "C"
