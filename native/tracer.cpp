// Native RV64IM tracer: the production witness producer.
//
// C++ twin of jolt_tpu/riscv/emulator.py (same architectural semantics,
// same SoA trace row schema), playing the role of the reference's Rust
// tracer (/root/reference/tracer/) as the host-side execution layer.
// Mode-equivalence gate: traces must be bit-identical to the Python
// emulator (tests/test_native_tracer.py), mirroring the reference's
// parallel-vs-serial tracer paranoia checks (tracer/src/parallel.rs).
//
// Build: g++ -O3 -shared -fPIC -o libjolt_tracer.so tracer.cpp

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>
#include <memory>

typedef uint64_t u64;
typedef int64_t i64;
typedef uint32_t u32;
typedef int32_t i32;
typedef uint16_t u16;
typedef uint8_t u8;

namespace {

constexpr u64 RAM_START = 0x80000000ull;

// Instruction kinds -- MUST match jolt_tpu/riscv/isa.py KINDS order.
enum Kind : u16 {
  NOOP = 0,
  LUI, AUIPC, JAL, JALR,
  BEQ, BNE, BLT, BGE, BLTU, BGEU,
  LB, LH, LW, LD_, LBU, LHU, LWU,
  SB, SH, SW, SD_,
  ADDI, SLTI, SLTIU, XORI, ORI, ANDI, SLLI, SRLI, SRAI,
  ADD, SUB, SLL, SLT, SLTU, XOR_, SRL, SRA, OR_, AND_,
  ADDIW, SLLIW, SRLIW, SRAIW,
  ADDW, SUBW, SLLW, SRLW, SRAW,
  FENCE, ECALL, EBREAK,
  MUL, MULH, MULHSU, MULHU, DIV, DIVU, REM, REMU,
  MULW, DIVW, DIVUW, REMW, REMUW,
  KIND_COUNT
};

struct Decoded {
  u16 kind;
  u8 rd, rs1, rs2;
  i64 imm;
  bool valid;
};

#pragma pack(push, 1)
struct TraceRow {
  u16 kind;
  u8 rd, rs1, rs2;      // rd = 255 when no destination
  u8 _pad[3];
  u64 pc;
  u64 rs1_val, rs2_val, rd_pre, rd_post;
  u64 ram_addr, ram_pre, ram_post;
  i64 imm;
  u64 next_pc;
};
#pragma pack(pop)

static inline i64 sext(u64 v, int bits) {
  return (i64)(v << (64 - bits)) >> (64 - bits);
}

Decoded decode(u32 w) {
  Decoded d{};
  d.valid = true;
  u32 opcode = w & 0x7F;
  d.rd = (w >> 7) & 0x1F;
  u32 f3 = (w >> 12) & 7;
  d.rs1 = (w >> 15) & 0x1F;
  d.rs2 = (w >> 20) & 0x1F;
  u32 f7 = (w >> 25) & 0x7F;
  switch (opcode) {
    case 0x37: d.kind = LUI; d.imm = sext(w & 0xFFFFF000u, 32); d.rs1 = d.rs2 = 0; return d;
    case 0x17: d.kind = AUIPC; d.imm = sext(w & 0xFFFFF000u, 32); d.rs1 = d.rs2 = 0; return d;
    case 0x6F: {
      u64 imm = (((w >> 31) & 1) << 20) | (((w >> 12) & 0xFF) << 12)
              | (((w >> 20) & 1) << 11) | (((w >> 21) & 0x3FF) << 1);
      d.kind = JAL; d.imm = sext(imm, 21); d.rs1 = d.rs2 = 0; return d;
    }
    case 0x67:
      if (f3 != 0) break;
      d.kind = JALR; d.imm = sext(w >> 20, 12); d.rs2 = 0; return d;
    case 0x63: {
      static const i32 br[8] = {BEQ, BNE, -1, -1, BLT, BGE, BLTU, BGEU};
      if (br[f3] < 0) break;
      u64 imm = (((w >> 31) & 1) << 12) | (((w >> 7) & 1) << 11)
              | (((w >> 25) & 0x3F) << 5) | (((w >> 8) & 0xF) << 1);
      d.kind = (u16)br[f3]; d.imm = sext(imm, 13); d.rd = 0; return d;
    }
    case 0x03: {
      static const i32 ld[8] = {LB, LH, LW, LD_, LBU, LHU, LWU, -1};
      if (ld[f3] < 0) break;
      d.kind = (u16)ld[f3]; d.imm = sext(w >> 20, 12); d.rs2 = 0; return d;
    }
    case 0x23: {
      static const i32 st[8] = {SB, SH, SW, SD_, -1, -1, -1, -1};
      if (st[f3] < 0) break;
      u64 imm = ((u64)(w >> 25) << 5) | d.rd;
      d.kind = (u16)st[f3]; d.imm = sext(imm, 12); d.rd = 0; return d;
    }
    case 0x13: {
      if (f3 == 1 && (w >> 26) == 0) { d.kind = SLLI; d.imm = (w >> 20) & 0x3F; d.rs2 = 0; return d; }
      if (f3 == 5) {
        u32 top = w >> 26, sh = (w >> 20) & 0x3F;
        if (top == 0x00) { d.kind = SRLI; d.imm = sh; d.rs2 = 0; return d; }
        if (top == 0x10) { d.kind = SRAI; d.imm = sh; d.rs2 = 0; return d; }
        break;
      }
      static const i32 oi[8] = {ADDI, -1, SLTI, SLTIU, XORI, -1, ORI, ANDI};
      if (oi[f3] < 0) break;
      d.kind = (u16)oi[f3]; d.imm = sext(w >> 20, 12); d.rs2 = 0; return d;
    }
    case 0x1B: {
      if (f3 == 0) { d.kind = ADDIW; d.imm = sext(w >> 20, 12); d.rs2 = 0; return d; }
      u32 sh = (w >> 20) & 0x1F;
      if (f3 == 1 && f7 == 0) { d.kind = SLLIW; d.imm = sh; d.rs2 = 0; return d; }
      if (f3 == 5 && f7 == 0x00) { d.kind = SRLIW; d.imm = sh; d.rs2 = 0; return d; }
      if (f3 == 5 && f7 == 0x20) { d.kind = SRAIW; d.imm = sh; d.rs2 = 0; return d; }
      break;
    }
    case 0x33: {
      u32 key = (f3 << 8) | f7;
      switch (key) {
        case 0x000: d.kind = ADD; return d;
        case 0x020: d.kind = SUB; return d;
        case 0x100: d.kind = SLL; return d;
        case 0x200: d.kind = SLT; return d;
        case 0x300: d.kind = SLTU; return d;
        case 0x400: d.kind = XOR_; return d;
        case 0x500: d.kind = SRL; return d;
        case 0x520: d.kind = SRA; return d;
        case 0x600: d.kind = OR_; return d;
        case 0x700: d.kind = AND_; return d;
        case 0x001: d.kind = MUL; return d;
        case 0x101: d.kind = MULH; return d;
        case 0x201: d.kind = MULHSU; return d;
        case 0x301: d.kind = MULHU; return d;
        case 0x401: d.kind = DIV; return d;
        case 0x501: d.kind = DIVU; return d;
        case 0x601: d.kind = REM; return d;
        case 0x701: d.kind = REMU; return d;
      }
      break;
    }
    case 0x3B: {
      u32 key = (f3 << 8) | f7;
      switch (key) {
        case 0x000: d.kind = ADDW; return d;
        case 0x020: d.kind = SUBW; return d;
        case 0x100: d.kind = SLLW; return d;
        case 0x500: d.kind = SRLW; return d;
        case 0x520: d.kind = SRAW; return d;
        case 0x001: d.kind = MULW; return d;
        case 0x401: d.kind = DIVW; return d;
        case 0x501: d.kind = DIVUW; return d;
        case 0x601: d.kind = REMW; return d;
        case 0x701: d.kind = REMUW; return d;
      }
      break;
    }
    case 0x0F: d.kind = FENCE; d.rd = d.rs1 = d.rs2 = 0; return d;
    case 0x73:
      if (w == 0x00000073) { d.kind = ECALL; d.rd = d.rs1 = d.rs2 = 0; return d; }
      if (w == 0x00100073) { d.kind = EBREAK; d.rd = d.rs1 = d.rs2 = 0; return d; }
      break;
  }
  d.valid = false;
  return d;
}

struct Layout {
  u64 input_start, input_end, output_start, output_end, panic, termination, io_end;
};

struct Machine {
  u64 pc;
  u64 regs[128];
  std::unordered_map<u64, std::unique_ptr<u8[]>> pages;
  Layout lay;
  const u8* inputs;
  u64 inputs_len;
  std::vector<u8> outputs;
  bool panic_flag = false, terminated = false;
  std::unordered_map<u32, Decoded> dcache;

  u8* page(u64 addr) {
    u64 pg = addr >> 12;
    auto it = pages.find(pg);
    if (it == pages.end()) {
      auto p = std::make_unique<u8[]>(4096);
      std::memset(p.get(), 0, 4096);
      it = pages.emplace(pg, std::move(p)).first;
    }
    return it->second.get();
  }

  u8 dev_load(u64 a) {
    if (a == lay.panic) return panic_flag ? 1 : 0;
    if (a >= lay.panic && a < lay.io_end) return 0;
    if (a >= lay.input_start && a < lay.input_end) {
      u64 off = a - lay.input_start;
      return off < inputs_len ? inputs[off] : 0;
    }
    if (a >= lay.output_start && a < lay.output_end) {
      u64 off = a - lay.output_start;
      return off < outputs.size() ? outputs[off] : 0;
    }
    return 0;
  }

  void dev_store(u64 a, u8 v) {
    if (a == lay.panic) { panic_flag = true; return; }
    if (a == lay.termination) { terminated = true; return; }
    if (a >= lay.output_start && a < lay.output_end) {
      u64 off = a - lay.output_start;
      if (outputs.size() <= off) outputs.resize(off + 1, 0);
      outputs[off] = v;
    }
  }

  u8 rd8(u64 a) { return a < RAM_START ? dev_load(a) : page(a)[a & 0xFFF]; }
  void wr8(u64 a, u8 v) { if (a < RAM_START) dev_store(a, v); else page(a)[a & 0xFFF] = v; }

  u64 rd(u64 a, int size) {
    u64 out = 0;
    for (int i = 0; i < size; i++) out |= (u64)rd8(a + i) << (8 * i);
    return out;
  }
  void wr(u64 a, u64 v, int size) {
    for (int i = 0; i < size; i++) wr8(a + i, (v >> (8 * i)) & 0xFF);
  }
};

static inline u64 alu_imm(u16 k, u64 a, i64 imm) {
  switch (k) {
    case ADDI: return a + (u64)imm;
    case SLTI: return (i64)a < imm ? 1 : 0;
    case SLTIU: return a < (u64)imm ? 1 : 0;
    case XORI: return a ^ (u64)imm;
    case ORI: return a | (u64)imm;
    case ANDI: return a & (u64)imm;
    case SLLI: return a << imm;
    case SRLI: return a >> imm;
    case SRAI: return (u64)((i64)a >> imm);
    case ADDIW: return (u64)(i64)(i32)(a + (u64)imm);
    case SLLIW: return (u64)(i64)(i32)((u32)a << imm);
    case SRLIW: return (u64)(i64)(i32)((u32)a >> imm);
    case SRAIW: return (u64)(i64)((i32)a >> imm);
  }
  return 0;
}

static inline u64 alu_reg(u16 k, u64 a, u64 b) {
  switch (k) {
    case ADD: return a + b;
    case SUB: return a - b;
    case SLL: return a << (b & 63);
    case SLT: return (i64)a < (i64)b ? 1 : 0;
    case SLTU: return a < b ? 1 : 0;
    case XOR_: return a ^ b;
    case SRL: return a >> (b & 63);
    case SRA: return (u64)((i64)a >> (b & 63));
    case OR_: return a | b;
    case AND_: return a & b;
    case ADDW: return (u64)(i64)(i32)(a + b);
    case SUBW: return (u64)(i64)(i32)(a - b);
    case SLLW: return (u64)(i64)(i32)((u32)a << (b & 31));
    case SRLW: return (u64)(i64)(i32)((u32)a >> (b & 31));
    case SRAW: return (u64)(i64)((i32)a >> (b & 31));
    case MUL: return a * b;
    case MULH: return (u64)(((__int128)(i64)a * (__int128)(i64)b) >> 64);
    case MULHSU: return (u64)(((__int128)(i64)a * (unsigned __int128)b) >> 64);
    case MULHU: return (u64)(((unsigned __int128)a * (unsigned __int128)b) >> 64);
    case MULW: return (u64)(i64)(i32)((u32)a * (u32)b);
    case DIV: {
      i64 sa = (i64)a, sb = (i64)b;
      if (sb == 0) return (u64)-1ll;
      if (sa == INT64_MIN && sb == -1) return (u64)sa;
      return (u64)(sa / sb);
    }
    case DIVU: return b == 0 ? ~0ull : a / b;
    case REM: {
      i64 sa = (i64)a, sb = (i64)b;
      if (sb == 0) return (u64)sa;
      if (sa == INT64_MIN && sb == -1) return 0;
      return (u64)(sa % sb);
    }
    case REMU: return b == 0 ? a : a % b;
    case DIVW: {
      i32 sa = (i32)a, sb = (i32)b;
      if (sb == 0) return (u64)(i64)-1;
      if (sa == INT32_MIN && sb == -1) return (u64)(i64)sa;
      return (u64)(i64)(sa / sb);
    }
    case DIVUW: {
      u32 ua = (u32)a, ub = (u32)b;
      return ub == 0 ? (u64)(i64)(i32)0xFFFFFFFF : (u64)(i64)(i32)(ua / ub);
    }
    case REMW: {
      i32 sa = (i32)a, sb = (i32)b;
      if (sb == 0) return (u64)(i64)sa;
      if (sa == INT32_MIN && sb == -1) return 0;
      return (u64)(i64)(sa % sb);
    }
    case REMUW: {
      u32 ua = (u32)a, ub = (u32)b;
      return ub == 0 ? (u64)(i64)(i32)ua : (u64)(i64)(i32)(ua % ub);
    }
  }
  return 0;
}

}  // namespace

extern "C" {

struct TraceResult {
  TraceRow* rows;
  u64 count;
  u8* outputs;
  u64 outputs_len;
  i32 panic_flag;
  i32 status;  // 0 ok, 1 decode error, 2 max cycles exceeded
  void* rows_owner;     // std::vector<TraceRow>*
  void* machine_owner;  // Machine*
};

TraceResult* jolt_trace(const u8* code, u64 code_len, u64 entry,
                        const u8* inputs, u64 inputs_len,
                        u64 input_start, u64 input_end,
                        u64 output_start, u64 output_end,
                        u64 panic_addr, u64 termination, u64 io_end,
                        u64 max_cycles) {
  auto* m = new Machine();
  m->pc = entry;
  std::memset(m->regs, 0, sizeof(m->regs));
  m->lay = {input_start, input_end, output_start, output_end,
            panic_addr, termination, io_end};
  m->inputs = inputs;
  m->inputs_len = inputs_len;
  for (u64 i = 0; i < code_len; i++) m->wr8(entry + i, code[i]);

  auto* res = new TraceResult();
  auto* rows = new std::vector<TraceRow>();
  rows->reserve(1 << 16);
  res->status = 0;

  while (!m->terminated) {
    if (rows->size() >= max_cycles) { res->status = 2; break; }
    u64 pc = m->pc;
    u32 word = (u32)m->rd(pc, 4);
    Decoded dec;
    auto it = m->dcache.find(word);
    if (it != m->dcache.end()) dec = it->second;
    else { dec = decode(word); m->dcache.emplace(word, dec); }
    if (!dec.valid) { res->status = 1; break; }

    u16 k = dec.kind;
    u8 rd = dec.rd;
    // rd=x0 jump remap to virtual register 32 (see emulator.py)
    if (rd == 0 && (k == JAL || k == JALR)) rd = 32;
    u64 rs1v = m->regs[dec.rs1];
    u64 rs2v = m->regs[dec.rs2];
    i64 imm = dec.imm;
    u64 next_pc = pc + 4;
    u64 rd_pre = m->regs[rd];
    u64 rd_post = rd_pre;
    u64 ram_addr = 0, ram_pre = 0, ram_post = 0;
    bool has_rd = true;

    switch (k) {
      case LUI: rd_post = (u64)imm; break;
      case AUIPC: rd_post = pc + (u64)imm; break;
      case JAL: rd_post = next_pc; next_pc = pc + (u64)imm; break;
      case JALR: rd_post = next_pc; next_pc = (rs1v + (u64)imm) & ~1ull; break;
      case BEQ: case BNE: case BLT: case BGE: case BLTU: case BGEU: {
        bool taken = false;
        switch (k) {
          case BEQ: taken = rs1v == rs2v; break;
          case BNE: taken = rs1v != rs2v; break;
          case BLT: taken = (i64)rs1v < (i64)rs2v; break;
          case BGE: taken = (i64)rs1v >= (i64)rs2v; break;
          case BLTU: taken = rs1v < rs2v; break;
          case BGEU: taken = rs1v >= rs2v; break;
        }
        if (taken) next_pc = pc + (u64)imm;
        has_rd = false;
        break;
      }
      case LB: case LH: case LW: case LD_: case LBU: case LHU: case LWU: {
        int size = (k == LB || k == LBU) ? 1 : (k == LH || k == LHU) ? 2
                 : (k == LW || k == LWU) ? 4 : 8;
        u64 addr = rs1v + (u64)imm;
        u64 raw = m->rd(addr, size);
        if (k == LB) raw = (u64)sext(raw, 8);
        else if (k == LH) raw = (u64)sext(raw, 16);
        else if (k == LW) raw = (u64)sext(raw, 32);
        rd_post = raw;
        ram_addr = addr & ~7ull;
        ram_pre = ram_post = m->rd(ram_addr, 8);
        break;
      }
      case SB: case SH: case SW: case SD_: {
        int size = k == SB ? 1 : k == SH ? 2 : k == SW ? 4 : 8;
        u64 addr = rs1v + (u64)imm;
        ram_addr = addr & ~7ull;
        ram_pre = m->rd(ram_addr, 8);
        u64 off = addr - ram_addr;
        u64 mask = (size == 8) ? ~0ull : (((1ull << (8 * size)) - 1) << (8 * off));
        ram_post = (ram_pre & ~mask) | ((rs2v << (8 * off)) & mask);
        m->wr(addr, rs2v, size);
        has_rd = false;
        break;
      }
      case FENCE: case ECALL: case EBREAK:
        has_rd = false;
        break;
      default:
        // ALU kinds, dispatched by enum range below.
        break;
    }
    if ((k >= ADDI && k <= SRAI) || (k >= ADDIW && k <= SRAIW))
      rd_post = alu_imm(k, rs1v, imm);
    else if ((k >= ADD && k <= AND_) || (k >= ADDW && k <= SRAW) || k >= MUL)
      rd_post = alu_reg(k, rs1v, rs2v);

    if (has_rd && rd != 0) m->regs[rd] = rd_post;
    if (rd == 0) { rd_post = 0; rd_pre = 0; }

    TraceRow row{};
    row.kind = k;
    row.rd = has_rd ? rd : 255;
    row.rs1 = dec.rs1;
    row.rs2 = dec.rs2;
    row.pc = pc;
    row.rs1_val = rs1v;
    row.rs2_val = rs2v;
    row.rd_pre = rd_pre;
    row.rd_post = (has_rd && rd != 0) ? m->regs[rd] : 0;
    row.ram_addr = ram_addr;
    row.ram_pre = ram_pre;
    row.ram_post = ram_post;
    row.imm = imm;
    row.next_pc = next_pc;
    rows->push_back(row);
    m->pc = next_pc;
  }

  res->rows = rows->data();
  res->count = rows->size();
  res->outputs = m->outputs.data();
  res->outputs_len = m->outputs.size();
  res->panic_flag = m->panic_flag ? 1 : 0;
  res->rows_owner = rows;
  res->machine_owner = m;
  return res;
}

// Fill caller-allocated SoA column buffers (length >= count) from the AoS
// rows.  u64 columns are split into (lo, hi) u32 words; imm uses its two's
// complement bit pattern.  Doing the transpose here avoids pathologically
// slow strided structured-array copies in numpy on some hosts.
void jolt_trace_fill_columns(
    TraceResult* res,
    u16* kind, u8* rd, u8* rs1, u8* rs2,
    u32* pc_lo, u32* pc_hi,
    u32* rs1_val_lo, u32* rs1_val_hi,
    u32* rs2_val_lo, u32* rs2_val_hi,
    u32* rd_pre_lo, u32* rd_pre_hi,
    u32* rd_post_lo, u32* rd_post_hi,
    u32* ram_addr_lo, u32* ram_addr_hi,
    u32* ram_pre_lo, u32* ram_pre_hi,
    u32* ram_post_lo, u32* ram_post_hi,
    u32* imm_lo, u32* imm_hi,
    u32* next_pc_lo, u32* next_pc_hi) {
  const TraceRow* rows = res->rows;
  const u64 n = res->count;
  for (u64 i = 0; i < n; i++) {
    const TraceRow& r = rows[i];
    kind[i] = r.kind; rd[i] = r.rd; rs1[i] = r.rs1; rs2[i] = r.rs2;
    auto split = [](u64 v, u32* lo, u32* hi, u64 i) {
      lo[i] = (u32)v; hi[i] = (u32)(v >> 32);
    };
    split(r.pc, pc_lo, pc_hi, i);
    split(r.rs1_val, rs1_val_lo, rs1_val_hi, i);
    split(r.rs2_val, rs2_val_lo, rs2_val_hi, i);
    split(r.rd_pre, rd_pre_lo, rd_pre_hi, i);
    split(r.rd_post, rd_post_lo, rd_post_hi, i);
    split(r.ram_addr, ram_addr_lo, ram_addr_hi, i);
    split(r.ram_pre, ram_pre_lo, ram_pre_hi, i);
    split(r.ram_post, ram_post_lo, ram_post_hi, i);
    split((u64)r.imm, imm_lo, imm_hi, i);
    split(r.next_pc, next_pc_lo, next_pc_hi, i);
  }
}

void jolt_trace_free(TraceResult* res) {
  delete static_cast<std::vector<TraceRow>*>(res->rows_owner);
  delete static_cast<Machine*>(res->machine_owner);
  delete res;
}

}  // extern "C"
