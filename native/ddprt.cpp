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

struct Slot {
  std::vector<uint8_t> data;
  double t_recv = -1.0;
  uint64_t seq = 0;
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

  void rx_loop() {
    std::vector<uint8_t> buf(kMaxPacket);
    while (running) {
      ssize_t n = recv(recv_fd, buf.data(), buf.size(), 0);
      if (n <= 0) {
        if (!running) break;
        continue;
      }
      if (n < 5) continue;
      uint32_t magic;
      memcpy(&magic, buf.data(), 4);
      if (magic != kMagic) continue;
      uint8_t clen = buf[4];
      if (5 + clen > n) continue;
      std::string channel(reinterpret_cast<char*>(buf.data()) + 5, clen);
      const uint8_t* payload = buf.data() + 5 + clen;
      size_t plen = n - 5 - clen;
      std::lock_guard<std::mutex> lk(mu);
      auto it = slots.find(channel);
      if (it == slots.end()) continue;  // not subscribed
      it->second.data.assign(payload, payload + plen);
      it->second.t_recv = now_s();
      it->second.seq++;
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

void* ps_create(const char* group, int port, int ttl, int loopback) {
  auto* bus = new Bus();
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

int ps_publish(void* h, const char* channel, const uint8_t* data, int len) {
  auto* bus = static_cast<Bus*>(h);
  size_t clen = strlen(channel);
  if (clen > 255 || len + clen + 5 > kMaxPacket) return -1;
  std::vector<uint8_t> pkt(5 + clen + len);
  memcpy(pkt.data(), &kMagic, 4);
  pkt[4] = static_cast<uint8_t>(clen);
  memcpy(pkt.data() + 5, channel, clen);
  memcpy(pkt.data() + 5 + clen, data, len);
  ssize_t sent = sendto(bus->send_fd, pkt.data(), pkt.size(), 0,
                        reinterpret_cast<sockaddr*>(&bus->group_addr),
                        sizeof(bus->group_addr));
  return sent == static_cast<ssize_t>(pkt.size()) ? 0 : -1;
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
