// annonet_client: dependency-free HTTP client for annonet_serve.
//
// The native embedding path (see annonet_client.h): POSIX sockets,
// HTTP/1.1 with Connection: close (one connection per request — the
// server is ThreadingHTTPServer, accept cost is negligible next to the
// device pass), Content-Length framing on both sides. No libcurl, no
// TLS (annonet_serve is a same-host/VPC sidecar, like the reference's
// in-process annonet_infer call, annonet_infer.h:15-17).

#include "annonet_client.h"

#include <arpa/inet.h>
#include <netdb.h>
#include <poll.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cerrno>
#include <cstdarg>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Response {
    int status = 0;
    std::string headers;  // raw header block (lowercased names not kept)
    std::string body;
};

}  // namespace

struct annonet_client {
    std::string host;
    int port = 0;
    int timeout_ms = 120000;
    std::string error;

    void set_error(const char* fmt, ...) {
        char buf[1024];
        va_list ap;
        va_start(ap, fmt);
        vsnprintf(buf, sizeof buf, fmt, ap);
        va_end(ap);
        error = buf;
    }
};

namespace {

int wait_fd(int fd, short events, int timeout_ms) {
    pollfd p{fd, events, 0};
    int rc;
    do {
        rc = poll(&p, 1, timeout_ms);
    } while (rc < 0 && errno == EINTR);
    return rc;  // 0 = timeout, <0 = error, >0 = ready
}

int connect_with_timeout(annonet_client* c) {
    addrinfo hints{};
    hints.ai_family = AF_UNSPEC;
    hints.ai_socktype = SOCK_STREAM;
    addrinfo* res = nullptr;
    char portbuf[16];
    snprintf(portbuf, sizeof portbuf, "%d", c->port);
    int rc = getaddrinfo(c->host.c_str(), portbuf, &hints, &res);
    if (rc != 0) {
        c->set_error("cannot resolve %s: %s", c->host.c_str(),
                     gai_strerror(rc));
        return -1;
    }
    int fd = -1;
    for (addrinfo* ai = res; ai; ai = ai->ai_next) {
        fd = socket(ai->ai_family,
                    ai->ai_socktype | SOCK_NONBLOCK, ai->ai_protocol);
        if (fd < 0) continue;
        if (connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
        if (errno == EINPROGRESS) {
            if (wait_fd(fd, POLLOUT, c->timeout_ms) > 0) {
                int err = 0;
                socklen_t len = sizeof err;
                getsockopt(fd, SOL_SOCKET, SO_ERROR, &err, &len);
                if (err == 0) break;
                errno = err;
            } else {
                errno = ETIMEDOUT;
            }
        }
        close(fd);
        fd = -1;
    }
    freeaddrinfo(res);
    if (fd < 0) {
        c->set_error("cannot connect to %s:%d: %s", c->host.c_str(),
                     c->port, strerror(errno ? errno : ECONNREFUSED));
    }
    return fd;
}

bool send_all(annonet_client* c, int fd, const void* data, size_t len) {
    const char* p = static_cast<const char*>(data);
    while (len > 0) {
        ssize_t n = send(fd, p, len, MSG_NOSIGNAL);
        if (n > 0) {
            p += n;
            len -= static_cast<size_t>(n);
            continue;
        }
        if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
            if (wait_fd(fd, POLLOUT, c->timeout_ms) > 0) continue;
            errno = ETIMEDOUT;
        }
        if (n < 0 && errno == EINTR) continue;
        c->set_error("send failed: %s", strerror(errno));
        return false;
    }
    return true;
}

// Read until EOF (Connection: close framing), enforcing per-read
// timeouts. Returns false on socket error/timeout.
bool recv_until_close(annonet_client* c, int fd, std::string* out) {
    char buf[65536];
    for (;;) {
        ssize_t n = recv(fd, buf, sizeof buf, 0);
        if (n > 0) {
            out->append(buf, static_cast<size_t>(n));
            continue;
        }
        if (n == 0) return true;  // orderly close
        if (errno == EAGAIN || errno == EWOULDBLOCK) {
            if (wait_fd(fd, POLLIN, c->timeout_ms) > 0) continue;
            errno = ETIMEDOUT;
        }
        if (errno == EINTR) continue;
        c->set_error("recv failed: %s", strerror(errno));
        return false;
    }
}

// Case-insensitive header lookup in a raw CRLF header block.
bool find_header(const std::string& headers, const char* name,
                 std::string* out) {
    size_t name_len = strlen(name);
    size_t pos = 0;
    while (pos < headers.size()) {
        size_t eol = headers.find("\r\n", pos);
        if (eol == std::string::npos) eol = headers.size();
        if (eol - pos > name_len + 1 &&
            strncasecmp(headers.c_str() + pos, name, name_len) == 0 &&
            headers[pos + name_len] == ':') {
            size_t v = pos + name_len + 1;
            while (v < eol && headers[v] == ' ') ++v;
            out->assign(headers, v, eol - v);
            return true;
        }
        pos = eol + 2;
    }
    return false;
}

bool http_request(annonet_client* c, const char* method,
                  const std::string& path,
                  const std::string& extra_headers,
                  const void* body, size_t body_len, Response* resp) {
    c->error.clear();
    int fd = connect_with_timeout(c);
    if (fd < 0) return false;

    std::string req;
    req.reserve(256 + body_len);
    req += method;
    req += " ";
    req += path;
    req += " HTTP/1.1\r\nHost: ";
    req += c->host;
    req += "\r\nConnection: close\r\n";
    req += extra_headers;
    char lenbuf[64];
    snprintf(lenbuf, sizeof lenbuf, "Content-Length: %zu\r\n\r\n",
             body_len);
    req += lenbuf;
    bool ok = send_all(c, fd, req.data(), req.size()) &&
              (body_len == 0 || send_all(c, fd, body, body_len));
    std::string raw;
    ok = ok && recv_until_close(c, fd, &raw);
    close(fd);
    if (!ok) return false;

    size_t hdr_end = raw.find("\r\n\r\n");
    if (hdr_end == std::string::npos ||
        sscanf(raw.c_str(), "HTTP/%*d.%*d %d", &resp->status) != 1) {
        c->set_error("malformed HTTP response (%zu bytes)", raw.size());
        return false;
    }
    resp->headers = raw.substr(0, hdr_end + 2);
    resp->body = raw.substr(hdr_end + 4);
    // Trust Content-Length when present (close framing can legally be
    // truncated by a dying peer; catch that here).
    std::string cl;
    if (find_header(resp->headers, "Content-Length", &cl)) {
        size_t want = strtoull(cl.c_str(), nullptr, 10);
        if (resp->body.size() < want) {
            c->set_error("truncated response body (%zu of %zu bytes)",
                         resp->body.size(), want);
            return false;
        }
        resp->body.resize(want);
    }
    return true;
}

// Non-2xx -> stash the server's error body (JSON) into last_error.
bool require_2xx(annonet_client* c, const Response& r, const char* what) {
    if (r.status / 100 == 2) return true;
    std::string body = r.body.substr(0, 512);
    c->set_error("%s failed: HTTP %d %s", what, r.status, body.c_str());
    return false;
}

char* dup_malloc(const std::string& s) {
    char* p = static_cast<char*>(malloc(s.size() + 1));
    if (p) memcpy(p, s.c_str(), s.size() + 1);
    return p;
}

}  // namespace

extern "C" {

annonet_client* annonet_client_create(const char* host, int port,
                                      int timeout_ms) {
    annonet_client* c = new annonet_client();
    c->host = host && *host ? host : "127.0.0.1";
    c->port = port;
    if (timeout_ms > 0) c->timeout_ms = timeout_ms;
    return c;
}

void annonet_client_destroy(annonet_client* c) { delete c; }

const char* annonet_client_last_error(const annonet_client* c) {
    return c ? c->error.c_str() : "null client";
}

int annonet_client_healthz(annonet_client* c, char** out_json) {
    if (!c || !out_json) return -1;
    *out_json = nullptr;
    Response r;
    if (!http_request(c, "GET", "/healthz", "", nullptr, 0, &r)) {
        return -2;
    }
    /* 503 is the server's own "device stalled" health signal and still
     * carries the full status payload ("status":"stalled", ...) — hand
     * it to the caller so it can distinguish a stalled device from a
     * dead server. Other statuses are errors. */
    if (r.status / 100 != 2 && r.status != 503 &&
        !require_2xx(c, r, "healthz")) {
        return -2;
    }
    *out_json = dup_malloc(r.body);
    return *out_json ? 0 : -3;
}

int annonet_client_infer(annonet_client* c,
                         const void* body, int64_t body_len,
                         int64_t raw_h, int64_t raw_w, int64_t raw_c,
                         const char* params,
                         uint16_t** out_labels,
                         int64_t* out_h, int64_t* out_w) {
    if (!c || !out_labels || !out_h || !out_w) return -1;
    *out_labels = nullptr;
    *out_h = *out_w = 0;
    if (!body || body_len <= 0) {
        c->set_error("empty request body");
        return -1;
    }
    bool raw = raw_h > 0 || raw_w > 0 || raw_c > 0;
    if (raw) {
        if (raw_h <= 0 || raw_w <= 0 || (raw_c != 1 && raw_c != 3)) {
            c->set_error("bad raw shape %lldx%lldx%lld",
                         (long long)raw_h, (long long)raw_w,
                         (long long)raw_c);
            return -1;
        }
        if (body_len != raw_h * raw_w * raw_c) {
            c->set_error("raw body is %lld bytes, expected %lld",
                         (long long)body_len,
                         (long long)(raw_h * raw_w * raw_c));
            return -1;
        }
    }

    std::string path = "/infer?format=labels";
    if (params && *params) {
        path += "&";
        path += params;
    }
    std::string extra = "Content-Type: application/octet-stream\r\n";
    if (raw) {
        char shape[96];
        snprintf(shape, sizeof shape, "X-Image-Shape: %lld,%lld,%lld\r\n",
                 (long long)raw_h, (long long)raw_w, (long long)raw_c);
        extra += shape;
    }
    Response r;
    if (!http_request(c, "POST", path, extra, body,
                      static_cast<size_t>(body_len), &r) ||
        !require_2xx(c, r, "infer")) {
        return -2;
    }
    std::string shape;
    long long h = 0, w = 0;
    if (!find_header(r.headers, "X-Label-Shape", &shape) ||
        sscanf(shape.c_str(), "%lld,%lld", &h, &w) != 2 || h < 1 || w < 1) {
        c->set_error("missing/bad X-Label-Shape header");
        return -3;
    }
    size_t want = static_cast<size_t>(h) * static_cast<size_t>(w) * 2;
    if (r.body.size() != want) {
        c->set_error("label body is %zu bytes, expected %zu",
                     r.body.size(), want);
        return -3;
    }
    uint16_t* labels = static_cast<uint16_t*>(malloc(want));
    if (!labels) {
        c->set_error("out of memory (%zu bytes)", want);
        return -3;
    }
    memcpy(labels, r.body.data(), want);
#if defined(__BYTE_ORDER__) && __BYTE_ORDER__ == __ORDER_BIG_ENDIAN__
    for (size_t i = 0; i < want / 2; ++i) {
        labels[i] = static_cast<uint16_t>((labels[i] >> 8) |
                                          (labels[i] << 8));
    }
#endif
    *out_labels = labels;
    *out_h = h;
    *out_w = w;
    return 0;
}

void annonet_client_free(void* p) { free(p); }

}  // extern "C"
