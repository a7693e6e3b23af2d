// ddprt: native runtime for parallel_ddp_tpu.
//
// Two components, replacing the reference's LCM plane (DDPHelpers/LCMHelpers.cuh):
//
//  1. A UDP-multicast publish/subscribe bus with named channels and
//     latest-wins single-slot delivery (the reference subscribes every LCM
//     channel with queue capacity 1, LCMHelpers.cuh:92,167).  Wire format:
//     [magic u32][channel_len u8][channel bytes][payload].  Default group/port
//     match LCM's defaults so the topology (solver box <-> robot box over an
//     ethernet adapter, utils/setLCMforEthAdapter.sh) carries over.
//
//  2. A lock-protected trajectory store + control evaluator for the kHz
//     trajectory-runner loop: u = u_k - K_k (x_meas - x_ref) with first-order
//     hold on x and zero-order hold on u/K (getHardwareControls,
//     MPCHelpers.cuh:817-858).  Runs free of the Python GIL.
//
// Exposed as a C ABI consumed via ctypes (runtime/pubsub.py, runtime/trajrunner.py).

#include <arpa/inet.h>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <netinet/in.h>
#include <string>
#include <sys/socket.h>
#include <sys/time.h>
#include <thread>
#include <unistd.h>
#include <unordered_map>
#include <vector>
#include <atomic>

namespace {

constexpr uint32_t kMagic = 0xDD90DD90u;
constexpr int kMaxPacket = 65000;
// LCM udpm wire constants (wire interop with lcm-spy / Drake / the iiwa
// driver — the reference's plane, LCMHelpers.cuh:23-28).  Big-endian headers:
// short:  [LC02 u32][msg_seq u32][channel\0][payload]
// frag:   [LC03 u32][msg_seq u32][msg_size u32][frag_offset u32]
//         [frag_no u16][frags_in_msg u16][channel\0 iff frag 0][chunk]
constexpr uint32_t kLcmMagicShort = 0x4c433032u;  // "LC02"
constexpr uint32_t kLcmMagicLong = 0x4c433033u;   // "LC03"
constexpr int kLcmMaxDatagram = 65499;
constexpr int kLcmFragHdr = 20;
constexpr int kLcmMaxMessage = 4 << 20;  // sanity cap on reassembled size

struct Slot {
  std::vector<uint8_t> data;
  double t_recv = -1.0;
  uint64_t seq = 0;
};

struct Reassembly {
  uint32_t msg_seq = 0;
  uint32_t size = 0;
  uint32_t got = 0;
  bool have_channel = false;
  std::string channel;
  std::vector<uint8_t> buf;
};

double now_s() {
  struct timeval tv;
  gettimeofday(&tv, nullptr);
  return tv.tv_sec + 1e-6 * tv.tv_usec;
}

struct Bus {
  int send_fd = -1;
  int recv_fd = -1;
  sockaddr_in group_addr{};
  std::thread rx_thread;
  std::atomic<bool> running{false};
  std::mutex mu;
  std::unordered_map<std::string, Slot> slots;  // subscribed channels only
  int wire = 0;          // 0 = native framing, 1 = LCM udpm framing (tx side)
  uint32_t tx_seq = 0;   // LCM per-publisher message sequence
  std::unordered_map<uint64_t, Reassembly> reasm;  // keyed by sender ip:port

  ~Bus() { stop(); }

  void stop() {
    running = false;
    if (recv_fd >= 0) {
      shutdown(recv_fd, SHUT_RDWR);
      close(recv_fd);
      recv_fd = -1;
    }
    if (rx_thread.joinable()) rx_thread.join();
    if (send_fd >= 0) {
      close(send_fd);
      send_fd = -1;
    }
  }

  void deliver(const std::string& channel, const uint8_t* payload,
               size_t plen) {
    std::lock_guard<std::mutex> lk(mu);
    auto it = slots.find(channel);
    if (it == slots.end()) return;  // not subscribed
    it->second.data.assign(payload, payload + plen);
    it->second.t_recv = now_s();
    it->second.seq++;
  }

  void rx_loop() {
    std::vector<uint8_t> buf(65536);
    while (running) {
      sockaddr_in src{};
      socklen_t srclen = sizeof(src);
      ssize_t n = recvfrom(recv_fd, buf.data(), buf.size(), 0,
                           reinterpret_cast<sockaddr*>(&src), &srclen);
      if (n <= 0) {
        if (!running) break;
        continue;
      }
      if (n < 5) continue;
      uint32_t magic;
      memcpy(&magic, buf.data(), 4);
      if (magic == kMagic) {
        // native framing: [magic][clen u8][channel][payload]
        uint8_t clen = buf[4];
        if (5 + clen > n) continue;
        std::string channel(reinterpret_cast<char*>(buf.data()) + 5, clen);
        deliver(channel, buf.data() + 5 + clen, n - 5 - clen);
        continue;
      }
      // receivers auto-detect LCM framing regardless of the tx wire mode
      uint32_t magic_be = ntohl(magic);
      if (magic_be == kLcmMagicShort) {
        if (n < 9) continue;
        const uint8_t* z = static_cast<const uint8_t*>(
            memchr(buf.data() + 8, 0, n - 8));
        if (!z) continue;
        std::string channel(reinterpret_cast<const char*>(buf.data()) + 8,
                            z - (buf.data() + 8));
        const uint8_t* payload = z + 1;
        deliver(channel, payload, buf.data() + n - payload);
        continue;
      }
      if (magic_be == kLcmMagicLong) {
        if (n < kLcmFragHdr) continue;
        uint32_t seq, size, off;
        uint16_t fno, nfrag;
        memcpy(&seq, buf.data() + 4, 4);
        memcpy(&size, buf.data() + 8, 4);
        memcpy(&off, buf.data() + 12, 4);
        memcpy(&fno, buf.data() + 16, 2);
        memcpy(&nfrag, buf.data() + 18, 2);
        seq = ntohl(seq);
        size = ntohl(size);
        off = ntohl(off);
        fno = ntohs(fno);
        nfrag = ntohs(nfrag);
        if (size > static_cast<uint32_t>(kLcmMaxMessage)) continue;
        uint64_t key = (static_cast<uint64_t>(src.sin_addr.s_addr) << 16) |
                       src.sin_port;
        Reassembly& r = reasm[key];
        if (r.msg_seq != seq || r.size != size || r.buf.size() != size) {
          r = Reassembly{};
          r.msg_seq = seq;
          r.size = size;
          r.buf.resize(size);
        }
        const uint8_t* body = buf.data() + kLcmFragHdr;
        size_t blen = n - kLcmFragHdr;
        if (fno == 0) {
          const uint8_t* z = static_cast<const uint8_t*>(
              memchr(body, 0, blen));
          if (!z) continue;
          r.channel.assign(reinterpret_cast<const char*>(body), z - body);
          r.have_channel = true;
          blen -= (z + 1 - body);
          body = z + 1;
        }
        if (off + blen > size) continue;
        memcpy(r.buf.data() + off, body, blen);
        r.got += blen;
        if (r.got >= size && r.have_channel) {
          deliver(r.channel, r.buf.data(), r.buf.size());
          reasm.erase(key);
        }
        continue;
      }
    }
  }
};

struct TrajStore {
  std::mutex mu;
  int n = 0, nx = 0, nu = 0;
  std::vector<float> x, u, K;  // (N,nx), (N,nu), (N,nu,nx) row-major
  double t0 = 0.0, dt = 0.0;
  bool valid = false;
};

}  // namespace

extern "C" {

// ---------------- pub/sub bus ----------------

// wire: 0 = native framing, 1 = LCM udpm framing on publish (receive always
// auto-detects both, so mixed fleets interoperate)
void* ps_create(const char* group, int port, int ttl, int loopback, int wire) {
  auto* bus = new Bus();
  bus->wire = wire;
  bus->send_fd = socket(AF_INET, SOCK_DGRAM, 0);
  bus->recv_fd = socket(AF_INET, SOCK_DGRAM, 0);
  if (bus->send_fd < 0 || bus->recv_fd < 0) {
    delete bus;
    return nullptr;
  }
  unsigned char t = static_cast<unsigned char>(ttl);
  setsockopt(bus->send_fd, IPPROTO_IP, IP_MULTICAST_TTL, &t, sizeof(t));
  unsigned char lb = loopback ? 1 : 0;
  setsockopt(bus->send_fd, IPPROTO_IP, IP_MULTICAST_LOOP, &lb, sizeof(lb));

  int reuse = 1;
  setsockopt(bus->recv_fd, SOL_SOCKET, SO_REUSEADDR, &reuse, sizeof(reuse));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_addr.s_addr = htonl(INADDR_ANY);
  addr.sin_port = htons(static_cast<uint16_t>(port));
  if (bind(bus->recv_fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) < 0) {
    delete bus;
    return nullptr;
  }
  ip_mreq mreq{};
  mreq.imr_multiaddr.s_addr = inet_addr(group);
  mreq.imr_interface.s_addr = htonl(INADDR_ANY);
  if (setsockopt(bus->recv_fd, IPPROTO_IP, IP_ADD_MEMBERSHIP, &mreq, sizeof(mreq)) < 0) {
    delete bus;
    return nullptr;
  }
  bus->group_addr.sin_family = AF_INET;
  bus->group_addr.sin_addr.s_addr = inet_addr(group);
  bus->group_addr.sin_port = htons(static_cast<uint16_t>(port));

  bus->running = true;
  bus->rx_thread = std::thread([bus] { bus->rx_loop(); });
  return bus;
}

void ps_destroy(void* h) { delete static_cast<Bus*>(h); }

int ps_subscribe(void* h, const char* channel) {
  auto* bus = static_cast<Bus*>(h);
  std::lock_guard<std::mutex> lk(bus->mu);
  bus->slots.emplace(std::string(channel), Slot{});
  return 0;
}

namespace {

int send_pkt(Bus* bus, const uint8_t* pkt, size_t len) {
  ssize_t sent = sendto(bus->send_fd, pkt, len, 0,
                        reinterpret_cast<sockaddr*>(&bus->group_addr),
                        sizeof(bus->group_addr));
  return sent == static_cast<ssize_t>(len) ? 0 : -1;
}

int publish_lcm(Bus* bus, const char* channel, const uint8_t* data, int len) {
  size_t clen = strlen(channel);
  uint32_t seq;
  {
    std::lock_guard<std::mutex> lk(bus->mu);
    seq = bus->tx_seq++;
  }
  uint32_t seq_be = htonl(seq);
  if (static_cast<int>(8 + clen + 1 + len) <= kLcmMaxDatagram) {
    std::vector<uint8_t> pkt(8 + clen + 1 + len);
    uint32_t magic_be = htonl(kLcmMagicShort);
    memcpy(pkt.data(), &magic_be, 4);
    memcpy(pkt.data() + 4, &seq_be, 4);
    memcpy(pkt.data() + 8, channel, clen);
    pkt[8 + clen] = 0;
    memcpy(pkt.data() + 9 + clen, data, len);
    return send_pkt(bus, pkt.data(), pkt.size());
  }
  if (len > kLcmMaxMessage) return -1;
  uint32_t magic_be = htonl(kLcmMagicLong);
  uint32_t size_be = htonl(static_cast<uint32_t>(len));
  int max0 = kLcmMaxDatagram - kLcmFragHdr - static_cast<int>(clen) - 1;
  int maxn = kLcmMaxDatagram - kLcmFragHdr;
  int nfrag = 1;
  for (int left = len - max0; left > 0; left -= maxn) nfrag++;
  int off = 0;
  for (int i = 0; i < nfrag; ++i) {
    int chunk = i == 0 ? max0 : maxn;
    if (chunk > len - off) chunk = len - off;
    std::vector<uint8_t> pkt;
    pkt.reserve(kLcmFragHdr + clen + 1 + chunk);
    pkt.resize(kLcmFragHdr);
    memcpy(pkt.data(), &magic_be, 4);
    memcpy(pkt.data() + 4, &seq_be, 4);
    memcpy(pkt.data() + 8, &size_be, 4);
    uint32_t off_be = htonl(static_cast<uint32_t>(off));
    memcpy(pkt.data() + 12, &off_be, 4);
    uint16_t fno_be = htons(static_cast<uint16_t>(i));
    uint16_t nfr_be = htons(static_cast<uint16_t>(nfrag));
    memcpy(pkt.data() + 16, &fno_be, 2);
    memcpy(pkt.data() + 18, &nfr_be, 2);
    if (i == 0) {
      pkt.insert(pkt.end(), channel, channel + clen);
      pkt.push_back(0);
    }
    pkt.insert(pkt.end(), data + off, data + off + chunk);
    if (send_pkt(bus, pkt.data(), pkt.size()) != 0) return -1;
    off += chunk;
  }
  return 0;
}

}  // namespace

int ps_publish(void* h, const char* channel, const uint8_t* data, int len) {
  auto* bus = static_cast<Bus*>(h);
  size_t clen = strlen(channel);
  if (clen > 255) return -1;
  if (bus->wire == 1) return publish_lcm(bus, channel, data, len);
  if (len + clen + 5 > kMaxPacket) return -1;
  std::vector<uint8_t> pkt(5 + clen + len);
  memcpy(pkt.data(), &kMagic, 4);
  pkt[4] = static_cast<uint8_t>(clen);
  memcpy(pkt.data() + 5, channel, clen);
  memcpy(pkt.data() + 5 + clen, data, len);
  return send_pkt(bus, pkt.data(), pkt.size());
}

// Returns payload length (>=0) and fills buf/t_recv/seq; -1 if nothing yet.
int ps_poll(void* h, const char* channel, uint8_t* buf, int maxlen,
            double* t_recv, uint64_t* seq) {
  auto* bus = static_cast<Bus*>(h);
  std::lock_guard<std::mutex> lk(bus->mu);
  auto it = bus->slots.find(channel);
  if (it == bus->slots.end() || it->second.t_recv < 0) return -1;
  const Slot& s = it->second;
  int n = static_cast<int>(s.data.size());
  if (n > maxlen) n = maxlen;
  memcpy(buf, s.data.data(), n);
  if (t_recv) *t_recv = s.t_recv;
  if (seq) *seq = s.seq;
  return n;
}

// ---------------- trajectory runner core ----------------

void* tr_create() { return new TrajStore(); }
void tr_destroy(void* h) { delete static_cast<TrajStore*>(h); }

void tr_set_traj(void* h, int n, int nx, int nu, const float* x, const float* u,
                 const float* K, double t0, double dt) {
  auto* tr = static_cast<TrajStore*>(h);
  std::lock_guard<std::mutex> lk(tr->mu);
  tr->n = n;
  tr->nx = nx;
  tr->nu = nu;
  tr->x.assign(x, x + static_cast<size_t>(n) * nx);
  tr->u.assign(u, u + static_cast<size_t>(n) * nu);
  tr->K.assign(K, K + static_cast<size_t>(n) * nu * nx);
  tr->t0 = t0;
  tr->dt = dt;
  tr->valid = true;
}

// u_out = u_k - K_k (x_meas - x_ref); FOH x, ZOH u/K.  Returns 0 ok, 1 off the
// end of the trajectory (fail loudly, MPCHelpers.cuh:827), 2 no trajectory yet.
int tr_get_control(void* h, double t, const float* x_meas, float* u_out,
                   int use_feedback) {
  auto* tr = static_cast<TrajStore*>(h);
  std::lock_guard<std::mutex> lk(tr->mu);
  if (!tr->valid) return 2;
  double rel = (t - tr->t0) / tr->dt;
  int ind = static_cast<int>(std::floor(rel));  // floor, not truncate: rel in
  double frac = rel - ind;                      // (-1,0) must reject, not ind=0
  if (ind < 0 || ind >= tr->n - 1) return 1;
  const float* uk = &tr->u[static_cast<size_t>(ind) * tr->nu];
  if (!use_feedback) {
    memcpy(u_out, uk, tr->nu * sizeof(float));
    return 0;
  }
  const float* xd = &tr->x[static_cast<size_t>(ind) * tr->nx];
  const float* xu = &tr->x[static_cast<size_t>(ind + 1) * tr->nx];
  const float* Kk = &tr->K[static_cast<size_t>(ind) * tr->nu * tr->nx];
  std::vector<float> dx(tr->nx);
  for (int i = 0; i < tr->nx; ++i) {
    float xref = static_cast<float>((1.0 - frac) * xd[i] + frac * xu[i]);
    dx[i] = x_meas[i] - xref;
  }
  for (int r = 0; r < tr->nu; ++r) {
    float val = uk[r];
    const float* Krow = Kk + static_cast<size_t>(r) * tr->nx;
    for (int c = 0; c < tr->nx; ++c) val -= Krow[c] * dx[c];
    u_out[r] = val;
  }
  return 0;
}

double ps_now() { return now_s(); }

}  // extern "C"
